"""Additive decomposition of the GAN step by LOSS construction (round 4).

Times a ladder of jitted programs, each adding one ingredient, so the
differences attribute the 97.7 ms bf16 step. Measured (v5e, batch 32):
g_trivial 53.7 | g_stft 58.0 | g_adv 67.6 | gen_step 58.6 | regen 15.2 |
d_loss 14.7 | gan_step 97.6 = g_adv + regen + d_loss (additive ✓).
NB: grad_scan must consume EVERY grad leaf or XLA DCEs most of the
backward (docs/MFU_r04.md "measurement lesson").

  g_trivial      grad of sum(y_hat^2)            — generator fwd+bwd floor
  g_stft         grad of the 6-res STFT loss     — + STFT fwd+bwd
  g_adv          grad incl. adversarial term     — + D fwd + D bwd-to-input
  gen_step       g_stft + RAdam update           — + optimizer
  d_loss         grad of the D loss only         — D fwd(2B) + D bwd
  stft_only      grad of the STFT loss w.r.t. a fixed waveform (no G)
  regen_fwd      inference-variant G forward only
  gan_step       the whole thing (the 97.7 anchor)

Usage: PYTHONPATH=. python tools/bisect_step_r04.py [--dtype bf16]
"""

import argparse
import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from bench import build_task, make_batch, time_train, force_done  # noqa: E402
from tools.bisect_generator_r04 import time_scan, grad_scan  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()
    dt = jnp.bfloat16 if args.dtype == "bf16" else None

    B, sr, hop = args.batch, 24000, 160
    Tf = sr // hop
    task = build_task(sr, compute_dtype=dt)
    state = task.init_state(jax.random.PRNGKey(0))
    batch = make_batch(jax.random.PRNGKey(1), B, Tf, hop)
    key = jax.random.PRNGKey(2)
    results = {}

    # -- grad ladders over g_params (batch closed over) -------------------
    def g_trivial(p, xs):
        return jnp.sum(task._forward(p, xs, key).astype(jnp.float32) ** 2)

    def g_stft(p, xs):
        loss, _ = task._gen_loss(p, state.d_params, xs, key, with_adv=False)
        return loss

    def g_adv(p, xs):
        loss, _ = task._gen_loss(p, state.d_params, xs, key, with_adv=True)
        return loss

    for name, fn in (("g_trivial", g_trivial), ("g_stft", g_stft),
                     ("g_adv", g_adv)):
        per = time_scan(grad_scan(fn, state.g_params, batch), k1=3, k2=13)
        results[name] = round(per * 1e3, 3)

    # -- D loss alone ------------------------------------------------------
    y_hat = jax.jit(lambda p: task._forward(p, batch, key))(state.g_params)
    y_hat = jax.block_until_ready(y_hat)

    def d_loss(p, xs):
        loss, _ = task._dis_loss(p, xs["audio"], y_hat)
        return loss

    per = time_scan(grad_scan(d_loss, state.d_params, batch), k1=3, k2=13)
    results["d_loss_grad"] = round(per * 1e3, 3)

    # -- STFT loss alone w.r.t. the waveform -------------------------------
    def stft_only(yh, xs):
        sc, mag = task.stft_loss(yh[..., 0], xs["audio"][..., 0])
        return sc + mag

    per = time_scan(grad_scan(stft_only, y_hat.astype(jnp.float32), batch),
                    k1=3, k2=13)
    results["stft_grad_wrt_waveform"] = round(per * 1e3, 3)

    # -- regeneration forward (inference variant) --------------------------
    def regen(p, xs):
        return jnp.sum(
            task._forward(p, xs, key, inference=True).astype(jnp.float32)
        )

    def regen_scan(K):
        def fn():
            def body(c, _):
                p = jax.tree.map(lambda a: a + c.astype(a.dtype),
                                 state.g_params)
                return regen(p, batch).astype(jnp.float32) * 1e-12, None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
            return c

        return fn

    per = time_scan(regen_scan, k1=3, k2=13)
    results["regen_fwd"] = round(per * 1e3, 3)

    # -- full steps ---------------------------------------------------------
    per, _, state2 = time_train(task.gen_step, state, batch, k1=5, k2=20)
    results["gen_step_full"] = round(per * 1e3, 3)
    per, _, _ = time_train(task.gan_step, state2, batch, k1=5, k2=20)
    results["gan_step_full"] = round(per * 1e3, 3)

    print(json.dumps({"dtype": args.dtype, "batch": B, "ms": results},
                     indent=1))


if __name__ == "__main__":
    main()
