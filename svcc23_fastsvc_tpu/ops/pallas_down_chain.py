"""Fused forward of a FastSVC DownsampleBlock conv chain (one pallas_call).

The sixth Pallas lowering attempt for the FastSVC small-C conv family
(VERDICT r4 next #5; docs/MFU_r04.md records the five previous on-chip
measurements, all losses). Hypothesis this kernel tests: the per-conv
attempts lost because a single conv gives XLA more cross-(B·T) pipelining
than a sequential Mosaic grid can recover — but a CHAIN of the block's
three dilated convs (reference harana/models/fastsvc.py:143-193:
h = conv3(l(conv2(l(conv1(l(x)))))) + res(x), dilations 1/2/4, zero pad)
amortizes the stream over three matmuls plus the residual, the structure
that actually beat XLA in the vocoder (ops/pallas_pd_block.py).

Forward-only (inference / no-grad regeneration surfaces); the A/B
harness is tools/down_chain_ab.py and the verdict gates any production
use — an unmeasured lowering never defaults on.

Mechanics (mirrors pd_fixed_chain): one [left halo | main | right halo]
VMEM window of the input; each stage computes the valid interior of its
predecessor's window rows, with out-of-[0,T) rows zeroed after every
stage (zero-pad semantics: the true streams are zero outside [0,T), and
halo rows computed from a zeroed window would otherwise carry bias
garbage into the next stage's edge reads).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    try:
        return jax.default_backend() != "tpu"
    except Exception:
        return True


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _leaky(x, slope=0.2):
    xf = x.astype(jnp.float32)
    return jnp.where(xf >= 0, xf, slope * xf).astype(x.dtype)


def chain_offsets(dilations):
    """Per-stage 32-aligned window offsets (same contract as
    pallas_pd_block.fixed_chain_offsets)."""
    offs, cur = [], 0
    for d in dilations:
        cur = 32 * max(1, -(-(cur + d) // 32))
        offs.append(cur)
    return offs


def _kernel(xl, xm, xr, W1, B1, W2, B2, W3, B3, WR, BR, y, Wa, Wb, Wc,
            *, S, H, dils, offs, T, C):
    t = pl.program_id(1)

    # window of the input stream over [t*S - H, t*S + S + H); rows outside
    # [0, T) zeroed (zero-pad semantics; also kills the edge-clamped halo
    # blocks' garbage)
    Wa[0:H] = xl[0]
    Wa[H : H + S] = xm[0]
    Wa[H + S :] = xr[0]
    pos = jax.lax.broadcasted_iota(
        jnp.int32, (2 * H + S, Wa.shape[-1]), 0
    ) + (t * S - H)
    Wa[...] = jnp.where((pos >= 0) & (pos < T), Wa[...], jnp.zeros_like(Wa))

    # residual: 1x1 conv of the raw input (central rows only)
    res = _dot(Wa[H : H + S, :], WR[0]) + BR[...].astype(jnp.float32)

    Ws = (W1, W2, W3)
    Bs = (B1, B2, B3)
    outs = (Wb, Wc, Wb)  # stage i reads its predecessor, writes outs[i]
    src = Wa
    for i, (d, a) in enumerate(zip(dils, offs)):
        dst = outs[i]
        L = 2 * H + S - 2 * a
        h = (
            _dot(_leaky(src[a - d : a - d + L, :]), Ws[i][0])
            + _dot(_leaky(src[a : a + L, :]), Ws[i][1])
            + _dot(_leaky(src[a + d : a + d + L, :]), Ws[i][2])
            + Bs[i][...].astype(jnp.float32)
        )
        # zero-pad semantics for the next stage's halo reads
        pos_i = jax.lax.broadcasted_iota(jnp.int32, (L, C), 0) + (
            t * S - H + a
        )
        h = jnp.where((pos_i >= 0) & (pos_i < T), h, 0.0)
        dst[a : a + L] = h.astype(dst.dtype)
        src = dst

    out = src[offs[-1] : offs[-1] + S, :].astype(jnp.float32) + res
    y[0] = out.astype(y.dtype)


def down_chain_fwd(x, params, *, dilations=(1, 2, 4), tile_target=3072):
    """Fused DownsampleBlock forward: conv1(d1)→conv2(d2)→conv3(d4) with
    leaky-on-input, + 1x1 res conv (reference fastsvc.py:143-193).

    Args:
        x: (B, T, C_in) nearest-downsampled input, T % 32 == 0.
        params: folded block params {"conv1","conv2","conv3","res_conv"},
            each {"w": (K, Cin, Cout), "b": (Cout,)}.
    Returns:
        (B, T, C) block output.
    """
    B, T, Cin = x.shape
    w1 = params["conv1"]["w"]
    w2 = params["conv2"]["w"]
    w3 = params["conv3"]["w"]
    wr = params["res_conv"]["w"]
    C = w1.shape[-1]
    if T % 32:
        raise ValueError("down_chain_fwd: T must be 32-aligned")
    offs = chain_offsets(dilations)
    H = offs[-1]
    if T < 2 * H:
        raise ValueError("down_chain_fwd: T too short for the chain halo")
    S = H * max(1, -(-tile_target // H))
    nT = max(-(-T // S), 1)

    b1 = params["conv1"]["b"][None, :]
    b2 = params["conv2"]["b"][None, :]
    b3 = params["conv3"]["b"][None, :]
    br = params["res_conv"]["b"][None, :]

    kernel = functools.partial(_kernel, S=S, H=H, dils=tuple(dilations),
                               offs=tuple(offs), T=T, C=C)
    full = lambda shape: [  # noqa: E731
        pl.BlockSpec(shape, lambda b, t: (0,) * len(shape),
                     memory_space=pltpu.VMEM)
    ]

    n_s = max(-(-T // S), 1)
    n_h = max(-(-T // H), 1)
    r = S // H
    halo_specs = [
        pl.BlockSpec((1, H, Cin),
                     lambda b, t: (b, jnp.maximum(t * r - 1, 0), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, S, Cin),
                     lambda b, t: (b, jnp.minimum(t, n_s - 1), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H, Cin),
                     lambda b, t: (b, jnp.minimum((t + 1) * r, n_h - 1), 0),
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, T, C), x.dtype),
        grid=(B, nT),
        in_specs=halo_specs
        + full(w1.shape) + full(b1.shape)
        + full(w2.shape) + full(b2.shape)
        + full(w3.shape) + full(b3.shape)
        + full(wr.shape) + full(br.shape),
        out_specs=pl.BlockSpec((1, S, C), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2 * H + S, Cin), x.dtype),
            pltpu.VMEM((2 * H + S, C), x.dtype),
            pltpu.VMEM((2 * H + S, C), x.dtype),
        ],
        interpret=_interpret(),
    )(x, x, x, w1, b1, w2, b2, w3, b3, wr, br)
