"""Per-component fwd+bwd timing of the FastSVC generator core (round 4).

The round-3 step bisect pinned the GAN step's bound at the generator
fwd+bwd (~57 of 97.7 ms bf16) but not WHERE inside the generator. The
conv-inventory roofline (docs/MFU_r04.md) says the convs alone cost
~4.3 ms fwd / ~13-20 ms fwd+bwd at speed of light — a 3-4x gap to the
measurement, so this tool times each sub-network separately (same
carried-state two-scan estimator as bench.py; fwd+bwd via jax.grad of a
sum loss with the input as the differentiated argument where weights
alone would dead-code the data path).

Usage: PYTHONPATH=. python tools/bisect_generator_r04.py [--dtype bf16]
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from bench import force_done  # noqa: E402


def time_scan(make_fn, *, k1=5, k2=25, reps=3):
    f1, f2 = jax.jit(make_fn(k1)), jax.jit(make_fn(k2))
    force_done(f1())
    force_done(f2())

    def timed(fn):
        t0 = time.perf_counter()
        force_done(fn())
        return time.perf_counter() - t0

    t1 = min(timed(f1) for _ in range(reps))
    t2 = min(timed(f2) for _ in range(reps))
    per = (t2 - t1) / (k2 - k1)
    return per if per > 0 else t2 / k2


def grad_scan(loss_fn, params, xs):
    """K iterations of grad(loss)(params, xs) with params carried through
    a tiny additive perturbation so the scan is sequentially dependent.

    The carry folds EVERY grad leaf — consuming only one leaf lets XLA
    dead-code-eliminate the other leaves' wgrad contractions (caught in
    round 4: a one-leaf carry under-measured the generator backward ~3x)."""

    def make(K):
        def fn():
            def body(c, _):
                p = jax.tree.map(lambda a: a + c.astype(a.dtype), params)
                g = jax.grad(lambda pp: loss_fn(pp, xs))(p)
                tot = sum(
                    jnp.mean(leaf).astype(jnp.float32)
                    for leaf in jax.tree.leaves(g)
                )
                return tot * 1e-12, None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
            return c

        return fn

    return make


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    from svcc23_fastsvc_tpu.models.fastsvc import (
        FastSVCGenerator,
        FiLMBlock,
    )

    B, sr = args.batch, 24000
    model = FastSVCGenerator(upsampling_scales=(5, 4, 4, 2))
    key = jax.random.PRNGKey(0)
    params = model.init(key)
    cast = lambda t: jax.tree.map(  # noqa: E731
        lambda x: x.astype(dt) if x.dtype == jnp.float32 else x, t
    )
    params = cast(params)

    ups = model._up_blocks()
    downs = model._down_blocks()
    results = {}

    # --- per up-block fwd+bwd at its true shapes -------------------------
    t_in = 150
    c_in = model.in_channels
    rng = jax.random.PRNGKey(1)
    for i, (blk, s, c) in enumerate(
        zip(ups, model.upsampling_scales, model.mid_channels)
    ):
        t_out = t_in * s
        rng, k1, k2, k3, k4 = jax.random.split(rng, 5)
        x = jax.random.normal(k1, (B, t_in, c_in), jnp.float32).astype(dt)
        film = (
            jax.random.normal(k2, (B, t_out, c), jnp.float32).astype(dt),
            jax.random.normal(k3, (B, t_out, c), jnp.float32).astype(dt),
        )
        emb = jax.random.normal(k4, (B, model.spk_emb_size),
                                jnp.float32).astype(dt)
        bp = params["up"][i]

        def loss(p, xs, blk=blk):
            x_, f_, e_ = xs
            return jnp.sum(
                blk.apply(p, x_, f_, (f_[0] * 0, f_[1] * 0), e_).astype(
                    jnp.float32
                ) ** 2
            )

        per = time_scan(grad_scan(loss, bp, (x, film, emb)))
        results[f"up{i}_C{c}_T{t_out}"] = round(per * 1e3, 3)
        t_in, c_in = t_out, c

    # --- the two downsample chains (as used: taps kept) ------------------
    rng, k1 = jax.random.split(rng)
    sig = jax.random.normal(k1, (B, 24000, 1), jnp.float32).astype(dt)

    def chain_loss(p, xs):
        h = xs
        tot = 0.0
        for blk, bp in zip(downs, p):
            h = blk.apply(bp, h)
            tot = tot + jnp.sum(h.astype(jnp.float32) ** 2)
        return tot

    per = time_scan(grad_scan(chain_loss, params["down_lft"], sig))
    results["down_chain_x1"] = round(per * 1e3, 3)

    # --- FiLM nets at each resolution (both signals) ---------------------
    film_T = [24000, 4800, 1200, 300]
    for c, t in zip(model.mid_channels[::-1], film_T):
        rng, k1 = jax.random.split(rng)
        x = jax.random.normal(k1, (B, t, c), jnp.float32).astype(dt)
        fb = FiLMBlock(c, model.use_weight_norm)
        idx = model.mid_channels[::-1].index(c)
        fp = params["film_sine"][idx]

        def loss(p, xs, fb=fb):
            s_, sh_ = fb.apply(p, xs)
            return jnp.sum(s_.astype(jnp.float32) ** 2) + jnp.sum(
                sh_.astype(jnp.float32) ** 2
            )

        per = time_scan(grad_scan(loss, fp, x))
        results[f"film_C{c}_T{t}_x1"] = round(per * 1e3, 3)

    # --- whole generator fwd+bwd (the 57 ms anchor) ----------------------
    rng, k1, k2, k3, k4 = jax.random.split(rng, 5)
    ppg = jax.random.normal(k1, (B, 150, 144), jnp.float32).astype(dt)
    sine = jax.random.normal(k2, (B, 24000, 1), jnp.float32).astype(dt)
    lft = jax.random.normal(k3, (B, 24000, 1), jnp.float32).astype(dt)
    emb = jax.random.normal(k4, (B, 512), jnp.float32).astype(dt)

    def g_loss(p, xs):
        a, b, c_, d = xs
        return jnp.sum(model.apply(p, a, b, c_, d).astype(jnp.float32) ** 2)

    per = time_scan(grad_scan(g_loss, params, (ppg, sine, lft, emb)),
                    k1=3, k2=13)
    results["generator_full"] = round(per * 1e3, 3)

    print(json.dumps({"dtype": args.dtype, "batch": B, "ms": results},
                     indent=1))


if __name__ == "__main__":
    main()
