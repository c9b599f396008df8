"""On-chip A/B of the adaptive-block pitch-gather lowerings.

The B02 vocoder's 20 AdaptiveBlocks dominate its forward (48.8 of 75.4 ms
at the f32-era bench shape; still the top component in bf16 — VERDICT r4
weak #5). Inside the fused kernel the cost over an equal-matmul FixedBlock
is the per-frame unaligned gather. Two lowerings:

  roll — 16-aligned dynamic slice, upcast to f32, dynamic pltpu.roll,
         slice [0:hop]  (the round-3/4 shipped path)
  mxu  — 16-aligned dynamic slice, one-hot (hop, L) permutation matmul
         on the MXU (bf16-native, exact, no roll/upcast data movement)

This tool measures both on the chip at the bench shape: per-dilation
adaptive-block ms, full vocoder forward ms/audio-s/s, compile wall, and
an on-chip allclose between the two lowerings AND vs the XLA reference
path. The winner becomes FASTSVC_PD_GATHER's default.

Usage: python tools/adaptive_gather_ab.py [--out JSON]
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from svcc23_fastsvc_tpu.dsp.f0 import dilated_factor  # noqa: E402
from svcc23_fastsvc_tpu.models.hnusfgan import (  # noqa: E402
    AdaptiveBlock,
    HNUSFGANGenerator,
    pd_indexing_framewise,
)
from svcc23_fastsvc_tpu.ops import fold_weight_norm  # noqa: E402
from svcc23_fastsvc_tpu.ops.pallas_pd_block import (  # noqa: E402
    pd_adaptive_block,
    pd_block_halo,
)
from svcc23_fastsvc_tpu.ops.signal_gen import SignalGenerator as SG  # noqa: E402

SR, HOP = 24000, 160
B, R, A = 8, 64, 62
T = SR


def time_scan(fn, args, k1=2, k2=12, reps=3):
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
    dt = jnp.bfloat16
    out = {"shape": {"B": B, "T": T, "hop": HOP}, "dtype": "bfloat16"}

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, T, R)).astype(dt)
    c = jax.random.normal(jax.random.PRNGKey(1), (B, T, A)).astype(dt)
    f0 = np.full((B, T // HOP, 1), 220.0, np.float32)
    df = jnp.asarray(np.stack([
        dilated_factor(f0[i, :, 0].copy(), SR, 4) for i in range(B)
    ]), jnp.float32)
    if df.shape[1] != T:
        df = jnp.repeat(df, T // df.shape[1], axis=1)

    ab = AdaptiveBlock(R, 128, 64, A, use_weight_norm=True)
    ap_params = jax.tree.map(lambda v: v.astype(dt), fold_weight_norm(
        ab.init(jax.random.PRNGKey(2))))

    def fused(gather, dil):
        halo = pd_block_halo(dil, SR, dense=4, f0_floor=37.5, hop=HOP)

        def fn(p, xx, cc, dd):
            shift = jnp.round(dd[:, ::HOP] * dil).astype(jnp.int32)
            shift = jnp.clip(shift, 0, halo)
            return pd_adaptive_block(xx, cc, shift, p, hop=HOP, halo=halo,
                                     gather=gather)

        return fn

    # numerics: both lowerings vs the XLA framewise path at d=4
    def xla_ref(p, xx, cc, dd):
        xP, xF = pd_indexing_framewise(xx, dd, 4, HOP)
        return ab.apply(p, xx, xP, xF, cc)

    y_ref = np.asarray(jax.device_get(
        jax.jit(xla_ref)(ap_params, x, c, df)), np.float32)
    for g in ("roll", "mxu"):
        t0 = time.perf_counter()
        y = np.asarray(jax.device_get(
            jax.jit(fused(g, 4))(ap_params, x, c, df)), np.float32)
        out[f"{g}_d4_compile_s"] = round(time.perf_counter() - t0, 1)
        out[f"{g}_allclose_vs_xla"] = bool(
            np.allclose(y_ref, y, rtol=2e-2, atol=2e-2))
        out[f"{g}_maxdiff_vs_xla"] = float(np.abs(y_ref - y).max())

    # per-dilation steady-state timing
    for g in ("roll", "mxu"):
        for dil in (1, 2, 4, 8):
            t = time_scan(fused(g, dil), (ap_params, x, c, df))
            out[f"{g}_adaptive_d{dil}_ms"] = round(t * 1e3, 3)
        out[f"{g}_adaptive_total_est_ms"] = round(
            5 * sum(out[f"{g}_adaptive_d{d}_ms"] for d in (1, 2, 4, 8)), 2)

    # full vocoder forward both ways (gather plumbed via env default)
    import os

    voc = HNUSFGANGenerator(upsample_scales=(5, 4, 4, 2), pd_frame_hop=HOP)
    vp = jax.tree.map(
        lambda v: v.astype(dt) if v.dtype == jnp.float32 else v,
        fold_weight_norm(voc.init(jax.random.PRNGKey(4))),
    )
    sg = SG(sample_rate=SR, hop_size=HOP, signal_types=("sine", "noise"))
    sine = jax.jit(sg)(jnp.asarray(f0), jax.random.PRNGKey(5)).astype(dt)
    acw = voc.aux_context_window
    caux = jax.random.normal(
        jax.random.PRNGKey(6), (B, T // HOP + 2 * acw, A)).astype(dt)

    for g in ("roll", "mxu"):
        os.environ["FASTSVC_PD_GATHER"] = g

        # fresh closure per g => fresh jit cache entry; the env default
        # is read at trace time inside pd_adaptive_block
        def fwd(p, xx, cc, dd):
            y, _ = voc.apply(p, xx, cc, dd)
            return y.astype(jnp.float32)

        t = time_scan(fwd, (vp, sine, caux, df))
        out[f"{g}_full_fwd_ms"] = round(t * 1e3, 3)
        out[f"{g}_full_audio_s_per_s"] = round(B * T / SR / t, 1)
    os.environ.pop("FASTSVC_PD_GATHER", None)

    text = json.dumps(out, indent=1)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    main()
