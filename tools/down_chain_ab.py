"""On-chip A/B: fused DownsampleBlock chain kernel vs the XLA block.

Sixth Pallas lowering attempt for the FastSVC small-C conv family
(docs/MFU_r04.md records attempts 1-5, all negative). Measures the
forward of the two hot down-chain blocks at the bench shape (batch 32,
24 kHz: block0 (1→24 ch, T=24000), block1 (24→48, T=12000)) in bf16 and
f32, fused (ops/pallas_down_chain.py) vs production XLA, plus an on-chip
allclose. The verdict decides whether the kernel gets wired into the
inference surfaces or recorded as negative #6.

Usage: python tools/down_chain_ab.py [--out JSON]
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from svcc23_fastsvc_tpu.models.fastsvc import DownsampleBlock  # noqa: E402
from svcc23_fastsvc_tpu.ops import fold_weight_norm  # noqa: E402
from svcc23_fastsvc_tpu.ops.pallas_down_chain import down_chain_fwd  # noqa: E402

B = 32
BLOCKS = [  # (cin, c, T at 24 kHz bench shape after its downsample)
    (1, 24, 24000),
    (24, 48, 12000),
]


def time_scan(fn, args, k1=4, k2=24, reps=3):
    def scan_of(K):
        def wrapped(*a):
            def body(c, _):
                eps = (c * 1e-12).astype(a[1].dtype)
                out = fn(a[0], a[1] + eps, *a[2:])
                return jnp.mean(out.astype(jnp.float32)), None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
            return c

        return jax.jit(wrapped)

    f1, f2 = scan_of(k1), scan_of(k2)
    np.asarray(jax.device_get(f1(*args)))
    np.asarray(jax.device_get(f2(*args)))

    def timed(f):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(f(*args)))
        return time.perf_counter() - t0

    t1 = min(timed(f1) for _ in range(reps))
    t2 = min(timed(f2) for _ in range(reps))
    per = (t2 - t1) / (k2 - k1)
    return per if per > 0 else t2 / k2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = {"batch": B, "blocks": BLOCKS}

    for dt_name, dt, tol in (("bf16", jnp.bfloat16, 3e-2),
                             ("f32", jnp.float32, 2e-4)):
        for cin, c, T in BLOCKS:
            tag = f"{dt_name}_c{cin}to{c}_T{T}"
            try:
                _run_case(out, dt, tol, cin, c, T, tag)
            except Exception as e:  # record (e.g. f32 VMEM OOM) and go on
                out[f"{tag}_error"] = f"{type(e).__name__}: {str(e)[:300]}"
                print(f"{tag} FAILED: {out[f'{tag}_error']}",
                      file=sys.stderr, flush=True)

    text = json.dumps(out, indent=1)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")


def _run_case(out, dt, tol, cin, c, T, tag):
    blk = DownsampleBlock(cin, c, scale=1, use_weight_norm=True)
    params = jax.tree.map(
        lambda v: v.astype(dt),
        fold_weight_norm(blk.init(jax.random.PRNGKey(0))),
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, cin)).astype(dt)

    def xla_fn(p, xx):
        return blk.apply(p, xx)

    # f32 doubles every scratch buffer and the C<=48 lane padding already
    # wastes most of each VMEM row; the default 3072-row tile OOMs scoped
    # vmem at f32 (16.7M > 16M), so halve it there
    tile = 3072 if dt == jnp.bfloat16 else 1152

    def fus_fn(p, xx):
        return down_chain_fwd(xx, p, tile_target=tile)

    t0 = time.perf_counter()
    y_ref = np.asarray(jax.device_get(jax.jit(xla_fn)(params, x)), np.float32)
    out[f"{tag}_xla_compile_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    y_fus = np.asarray(jax.device_get(jax.jit(fus_fn)(params, x)), np.float32)
    out[f"{tag}_fused_compile_s"] = round(time.perf_counter() - t0, 1)
    out[f"{tag}_allclose"] = bool(np.allclose(y_ref, y_fus, rtol=tol, atol=tol))
    out[f"{tag}_maxdiff"] = float(np.abs(y_ref - y_fus).max())

    out[f"{tag}_xla_ms"] = round(time_scan(xla_fn, (params, x)) * 1e3, 3)
    out[f"{tag}_fused_ms"] = round(time_scan(fus_fn, (params, x)) * 1e3, 3)
    print(f"{tag}: xla {out[f'{tag}_xla_ms']} ms, fused "
          f"{out[f'{tag}_fused_ms']} ms, allclose {out[f'{tag}_allclose']}",
          file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
