"""Microbenchmark: lowering strategies for the generator's hot conv shape.

The FastSVC generator's sample-rate stacks run K=3 dilated convs at 24-192
channels over T up to 24000 x batch 32 — small-channel shapes that underfill
the MXU's 128 lanes (README "standing optimization target"). This compares:

  conv    lax.conv_general_dilated NWC (current production path)
  einsum  explicit shifted-slice einsum '3 taps -> one (B*T, K*C) matmul'
  matmul  pre-gathered im2col matmul via jnp.dot

per (C_in, C_out, dilation) shape in bf16, reporting achieved TFLOP/s.
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import force_done  # noqa: E402


def conv_lax(x, w, d):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=((d, d),), rhs_dilation=(d,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


def conv_einsum(x, w, d):
    # pad then 3 shifted slices stacked on a new tap axis -> one einsum
    B, T, C = x.shape
    xp = jnp.pad(x, ((0, 0), (d, d), (0, 0)))
    taps = jnp.stack([xp[:, i * d : i * d + T] for i in range(3)], axis=2)
    return jnp.einsum("btkc,kco->bto", taps, w)


def conv_matmul(x, w, d):
    B, T, C = x.shape
    K, _, Co = w.shape
    xp = jnp.pad(x, ((0, 0), (d, d), (0, 0)))
    taps = jnp.concatenate([xp[:, i * d : i * d + T] for i in range(3)], axis=-1)
    return taps.reshape(B * T, K * C) @ w.reshape(K * C, Co)


VARIANTS = {"conv": conv_lax, "einsum": conv_einsum, "matmul": conv_matmul}


def scan_of(fn, x, w, d, K):
    def wrapped(x):
        def body(c, _):
            out = fn(x + c.astype(x.dtype), w, d)
            return (jnp.mean(out) * 1e-12).astype(jnp.float32), None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return c

    return jax.jit(wrapped)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--k1", type=int, default=10)
    ap.add_argument("--k2", type=int, default=50)
    args = ap.parse_args()
    B = args.batch

    shapes = [
        (24, 24, 24000, 27),
        (24, 24, 24000, 9),
        (48, 48, 12000, 9),
        (96, 96, 3000, 9),
        (192, 192, 750, 9),
    ]
    for C_in, C_out, T, d in shapes:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (B, T, C_in), jnp.bfloat16)
        w = jax.random.normal(key, (3, C_in, C_out), jnp.bfloat16) * 0.1
        flops = 2 * 3 * C_in * C_out * T * B
        row = {}
        for name, fn in VARIANTS.items():
            f1 = scan_of(fn, x, w, d, args.k1)
            f2 = scan_of(fn, x, w, d, args.k2)
            force_done(f1(x)); force_done(f2(x))

            def timed(f):
                t0 = time.perf_counter()
                force_done(f(x))
                return time.perf_counter() - t0

            t1 = min(timed(f1) for _ in range(3))
            t2 = min(timed(f2) for _ in range(3))
            per = (t2 - t1) / (args.k2 - args.k1)
            if per <= 0:
                per = t2 / args.k2
            row[name] = round(flops / per / 1e12, 2)
        print(f"C{C_in}->{C_out} T{T} d{d}: TFLOP/s {row}", flush=True)


if __name__ == "__main__":
    main()
