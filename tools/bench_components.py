"""Component-level timing of the FastSVC GAN step on the current backend.

Breaks the full gan_step (bench.py's headline) into its constituent device
programs and times each with the same two-scan-length difference estimator
bench.py uses (dispatch latency cancels; completion forced by device_get).
Use this to decide where optimization effort goes — the README's standing
target is the single-digit MFU of the sustained train step.

Usage:  python tools/bench_components.py [--dtype bf16|f32] [--batch 32]
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from bench import build_task, flops_of, force_done, make_batch  # noqa: E402


def time_scan(make_fn, carry, *, k1=5, k2=25, reps=3):
    """make_fn(K) -> jitted fn(carry) returning a forceable carry."""
    f1, f2 = make_fn(k1), make_fn(k2)
    force_done(f1(carry))
    force_done(f2(carry))

    def timed(fn):
        t0 = time.perf_counter()
        force_done(fn(carry))
        return time.perf_counter() - t0

    t1 = min(timed(f1) for _ in range(reps))
    t2 = min(timed(f2) for _ in range(reps))
    per = (t2 - t1) / (k2 - k1)
    return per if per > 0 else t2 / k2


def scan_of(fn, K):
    """Iterate y = fn(x + eps*mean(y_prev)) K times (sequentially dependent,
    numerically inert perturbation)."""

    def wrapped(x):
        def body(c, _):
            out = fn(x + c * 1e-12)
            return jnp.mean(jax.tree.leaves(out)[0]).astype(jnp.float32), None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return c

    return jax.jit(wrapped)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--k1", type=int, default=5)
    ap.add_argument("--k2", type=int, default=25)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    dt = jnp.bfloat16 if args.dtype == "bf16" else None
    B, sr, hop = args.batch, 24000, 160
    Tf = sr // hop
    task = build_task(sr, compute_dtype=dt)
    state = task.init_state(jax.random.PRNGKey(0))
    batch = make_batch(jax.random.PRNGKey(1), B, Tf, hop)
    key = jax.random.PRNGKey(2)
    kw = dict(k1=args.k1, k2=args.k2, reps=args.reps)

    y = batch["audio"]
    y_hat = jax.jit(task._forward)(state.g_params, batch, key)
    force_done(y_hat)

    results = {}

    def run(name, fn, x):
        g = scan_of(fn, 1)  # compile probe for flops
        fl = flops_of(g, x)
        t = time_scan(lambda K: scan_of(fn, K), x, **kw)
        results[name] = {
            "ms": round(t * 1e3, 2),
            "gflop": round(fl / 1e9, 1) if fl else None,
            "tflops": round(fl / t / 1e12, 2) if fl else None,
        }
        print(name, results[name], flush=True)

    # 1. generator forward
    run("g_fwd", lambda x: task._forward(state.g_params, batch | {"ppg": x}, key),
        batch["ppg"])

    # 2. generator fwd+bwd through STFT loss only (phase-A gradient)
    run("g_grad_stft",
        lambda x: jax.grad(
            lambda p: task._gen_loss(p, state.d_params, batch | {"ppg": x},
                                     key, with_adv=False)[0]
        )(state.g_params),
        batch["ppg"])

    # 3. STFT loss forward alone (on fixed waveforms)
    run("stft_fwd",
        lambda x: jnp.asarray(task.stft_loss(x[..., 0], y[..., 0])).sum(),
        y_hat)

    # 4. STFT loss fwd+bwd
    run("stft_grad",
        lambda x: jax.grad(
            lambda z: jnp.asarray(task.stft_loss(z[..., 0], y[..., 0])).sum()
        )(x),
        y_hat)

    # 5. discriminator forward
    run("d_fwd",
        lambda x: task.discriminator.apply(task._cast(state.d_params),
                                           task._cast(x)),
        y_hat)

    # 6. discriminator loss fwd+bwd wrt d_params (real+fake = 2 fwd)
    run("d_grad",
        lambda x: jax.grad(
            lambda p: task._dis_loss(p, y, x)[0]
        )(state.d_params),
        y_hat)

    # 7. sine excitation
    run("sine", lambda x: task.signal_generator(x, key), batch["f0"])

    # 8. full gan step
    def full(x):
        s2, _ = task.gan_step(state, batch | {"ppg": x})
        return s2.g_params

    run("gan_step", full, batch["ppg"])

    print(json.dumps({"dtype": args.dtype, "batch": B, **results}))


if __name__ == "__main__":
    main()
