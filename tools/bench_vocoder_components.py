"""Component-level timing of the B02 HN-uSFGAN vocoder forward.

Breaks the 22-ms bench forward (B=8, T=24000, bf16, fused Pallas blocks)
into: per-block costs for the AdaptiveBlock and FixedBlock kernels at each
dilation in the production config, the conditioning upsampler, and the
periodicity estimator — to decide whether the remaining HBM round-trips
(55 separate pallas_calls, each re-reading the (B,T,64) stream and the
(B,T,62) conditioning) are worth fusing into multi-block chain kernels.

Usage:  python tools/bench_vocoder_components.py
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from svcc23_fastsvc_tpu.dsp.f0 import dilated_factor  # noqa: E402
from svcc23_fastsvc_tpu.models.hnusfgan import (  # noqa: E402
    HNUSFGANGenerator,
    _pd_mode_on,
)
from svcc23_fastsvc_tpu.ops.signal_gen import SignalGenerator as SG  # noqa: E402
from svcc23_fastsvc_tpu.ops import fold_weight_norm  # noqa: E402

SR, HOP = 24000, 160
B, R, A = 8, 64, 62
T = SR  # 1 s


def time_scan(fn, args, k1=2, k2=8, reps=3):
    """Two-length scan-difference estimator (bench.py's)."""

    def scan_of(K):
        def wrapped(*a):
            def body(c, _):
                eps = (c * 1e-12).astype(a[1].dtype)
                out = fn(a[0], a[1] + eps, *a[2:])
                return jnp.mean(
                    jax.tree.leaves(out)[0].astype(jnp.float32)
                ), None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
            return c

        return jax.jit(wrapped)

    f1, f2 = scan_of(k1), scan_of(k2)
    jax.block_until_ready(f1(*args))
    jax.block_until_ready(f2(*args))

    def timed(f):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        return time.perf_counter() - t0

    t1 = min(timed(f1) for _ in range(reps))
    t2 = min(timed(f2) for _ in range(reps))
    per = (t2 - t1) / (k2 - k1)
    return per if per > 0 else t2 / k2


def main():
    dt = jnp.bfloat16
    assert _pd_mode_on(dt), "fused pd blocks must be on for this breakdown"
    from svcc23_fastsvc_tpu.models.hnusfgan import (
        _fixed_fused_apply,
        _pd_fused_apply,
        AdaptiveBlock,
        FixedBlock,
    )

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, T, R)).astype(dt)
    c = jax.random.normal(key, (B, T, A)).astype(dt)
    f0 = np.full((B, T // HOP, 1), 220.0, np.float32)
    df = jnp.asarray(np.stack([
        dilated_factor(f0[i, :, 0].copy(), SR, 4) for i in range(B)
    ]), jnp.float32)
    if df.shape[1] != T:
        df = jnp.repeat(df, T // df.shape[1], axis=1)

    out = {}

    # ---- per-block kernels at the production dilations --------------------
    ab = AdaptiveBlock(R, 128, 64, A, True)
    ap = jax.tree.map(lambda v: v.astype(dt), fold_weight_norm(
        ab.init(jax.random.PRNGKey(1))))
    for dil in (1, 2, 4, 8):
        t = time_scan(
            lambda p, xx, cc, dd: _pd_fused_apply(p, xx, cc, dd, dil, HOP),
            (ap, x, c, df),
        )
        out[f"adaptive_d{dil}_ms"] = round(t * 1e3, 3)

    fb = FixedBlock(R, 128, 64, A, dilation=1, use_weight_norm=True)
    fp = jax.tree.map(lambda v: v.astype(dt), fold_weight_norm(
        fb.init(jax.random.PRNGKey(2))))
    for dil in (1, 2, 4, 8, 16):
        t = time_scan(
            lambda p, xx, cc: _fixed_fused_apply(p, xx, cc, dil),
            (fp, x, c),
        )
        out[f"fixed_d{dil}_ms"] = round(t * 1e3, 3)

    # ---- aux nets ----------------------------------------------------------
    voc = HNUSFGANGenerator(upsample_scales=(5, 4, 4, 2), pd_frame_hop=HOP)
    vp = jax.tree.map(
        lambda v: v.astype(dt) if v.dtype == jnp.float32 else v,
        fold_weight_norm(voc.init(jax.random.PRNGKey(4))),
    )
    from svcc23_fastsvc_tpu.models.hnusfgan import (
        ConvInUpsampleNetwork,
        PeriodicityEstimator,
    )

    ups = ConvInUpsampleNetwork((5, 4, 4, 2), A, voc.aux_context_window, True)
    per = PeriodicityEstimator(A, R, voc.periodicity_layers,
                               voc.periodicity_kernel, use_weight_norm=True)
    acw = voc.aux_context_window
    caux = jax.random.normal(key, (B, T // HOP + 2 * acw, A)).astype(dt)
    t = time_scan(lambda p, cc: ups.apply(p, cc), (vp["upsample"], caux))
    out["upsampler_ms"] = round(t * 1e3, 3)
    t = time_scan(lambda p, cc: per.apply(p, cc), (vp["periodicity"], c))
    out["periodicity_ms"] = round(t * 1e3, 3)

    # ---- full forward ------------------------------------------------------
    sg = SG(sample_rate=SR, hop_size=HOP, signal_types=("sine", "noise"))
    sine2 = jax.jit(sg)(jnp.asarray(f0), jax.random.PRNGKey(5)).astype(dt)

    def fwd(p, xx, cc, dd):
        y, _ = voc.apply(p, xx, cc, dd)
        return y.astype(jnp.float32)

    t = time_scan(fwd, (vp, sine2, caux, df))
    out["full_fwd_ms"] = round(t * 1e3, 3)

    # production block inventory: 20 adaptive (cycle 4: d=1,2,4,8 x5),
    # 5 noise fixed (d=1,2,4,8,16), 30 filter fixed (cycle 3: d=1,2,4 x10)
    adaptive_total = 5 * sum(out[f"adaptive_d{d}_ms"] for d in (1, 2, 4, 8))
    fixed_total = (10 * (out["fixed_d1_ms"] + out["fixed_d2_ms"]
                         + out["fixed_d4_ms"])
                   + sum(out[f"fixed_d{d}_ms"] for d in (1, 2, 4, 8, 16)))
    out["adaptive_total_est_ms"] = round(adaptive_total, 2)
    out["fixed_total_est_ms"] = round(fixed_total, 2)
    out["aux_total_ms"] = round(out["upsampler_ms"] + out["periodicity_ms"], 2)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
