"""Training-capable fused "window" conv for small-channel 1-D convs.

Why this exists (round 4): the production taps-einsum lowering
(ops/conv.py _conv1d_taps_einsum) materializes a (B, T, K*C) tap operand in
the forward AND a (B, T, K*C_out) one in the backward — 3x the activation
bytes through HBM per conv. At the generator's hot shapes (C=24 @ T=24000,
C=48 @ T=12000, batch 32) that is ~300 MB of traffic per conv against a
~75 MB speed-of-light, and the round-3 step bisect measured the generator
fwd+bwd core at 8.6% MFU while the conv-inventory roofline allows ~24%
(docs/MFU_r04.md).

This kernel reuses the structure that already beat XLA on-chip in the
round-3 vocoder work (ops/pallas_pd_block._fixed_kernel, 4.2x per block):
stream the input ONCE through a [left halo | main | right halo] VMEM
window, take the K taps as static-offset window slices, and do K small
dots — x is read once, y written once, nothing else touches HBM.

Three kernels:
  * _fwd_kernel     y[g] = sum_k act(x)[g - lo + k*dil] @ w[k] + b
                    (act = optional fused leaky_relu, applied in f32 —
                    Mosaic rejects bf16 comparisons)
  * dx reuses _fwd_kernel with w reversed+transposed (same-padding convs
    are self-adjoint in shape), leaky mask applied outside.
  * _wgrad_kernel   dw[k] += act(x)[.. shifted ..]^T @ g ;  db += sum g
                    accumulated in f32 VMEM scratch across the sequential
                    TPU grid, written at the last grid step.

Restrictions (gate in window_conv1d_supported): stride 1, groups 1, odd
K in [3, 5], symmetric "same" zero padding lo == hi == (K-1)//2 * dil,
channels <= 128. All generator FiLM/up/down K=3 convs qualify.

Numerics: dots accumulate in f32 (preferred_element_type), same
matmul-class precision as the einsum path. Inference-and-training: the
custom VJP lives in ops/conv.py (window_conv1d).
"""

from __future__ import annotations

import functools
import math

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


def _halo(lo: int) -> int:
    return 32 * max(1, -(-lo // 32))


def _pick_tile(H: int, target: int = 3072) -> int:
    return H * max(1, -(-target // H))


def _apply_leaky_f32(v, slope):
    """leaky_relu with the compare in f32 (Mosaic rejects bf16 compares)."""
    v32 = v.astype(jnp.float32)
    return jnp.where(v32 >= 0.0, v32, slope * v32)


def _fwd_kernel(xl, xm, xr, *rest, S, H, K, dil, lo, T, slope, has_bias):
    if has_bias:
        ws, b, y = rest[:K], rest[K], rest[K + 1]
    else:
        ws, b, y = rest[:K], None, rest[K]
    W = rest[-1]  # scratch
    t = pl.program_id(1)
    R = xm.shape[-1]
    W[0:H] = xl[0]
    W[H : H + S] = xm[0]
    W[H + S :] = xr[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (2 * H + S, R), 0) + (t * S - H)
    W[...] = jnp.where((pos >= 0) & (pos < T), W[...], jnp.zeros_like(W))
    if slope is not None:
        W[...] = _apply_leaky_f32(W[...], slope).astype(W.dtype)

    acc = b[...].astype(jnp.float32) if b is not None else jnp.float32(0.0)
    for k in range(K):
        off = H - lo + k * dil
        acc = acc + _dot(W[off : off + S, :], ws[k][...])
    y[0] = acc.astype(y.dtype)


def _wgrad_kernel(xl, xm, xr, g, dw, db, W, dw_acc, db_acc,
                  *, S, H, K, dil, lo, T, slope):
    b_i, t = pl.program_id(0), pl.program_id(1)
    nB, nT = pl.num_programs(0), pl.num_programs(1)
    R = xm.shape[-1]
    W[0:H] = xl[0]
    W[H : H + S] = xm[0]
    W[H + S :] = xr[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (2 * H + S, R), 0) + (t * S - H)
    W[...] = jnp.where((pos >= 0) & (pos < T), W[...], jnp.zeros_like(W))
    if slope is not None:
        W[...] = _apply_leaky_f32(W[...], slope).astype(W.dtype)

    # mask cotangent rows past T (partial edge tile garbage)
    Co = g.shape[-1]
    posg = jax.lax.broadcasted_iota(jnp.int32, (S, Co), 0) + t * S
    g32 = jnp.where(posg < T, g[0], jnp.zeros_like(g[0]))

    @pl.when((b_i == 0) & (t == 0))
    def _():
        dw_acc[...] = jnp.zeros_like(dw_acc)
        db_acc[...] = jnp.zeros_like(db_acc)

    for k in range(K):
        off = H - lo + k * dil
        xk = W[off : off + S, :]
        # (R, S) @ (S, Co) contraction over the tile rows
        contrib = jax.lax.dot_general(
            xk, g32, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dw_acc[k * R : (k + 1) * R, :] = dw_acc[k * R : (k + 1) * R, :] + contrib
    ones = jnp.ones((1, S), g32.dtype)
    db_acc[...] = db_acc[...] + _dot(ones, g32)

    @pl.when((b_i == nB - 1) & (t == nT - 1))
    def _():
        dw[...] = dw_acc[...]
        db[...] = db_acc[...]


def window_conv1d_supported(x_shape, w_shape, *, stride, groups, lo, hi,
                            dilation) -> bool:
    K, C_in, C_out = w_shape
    if stride != 1 or groups != 1:
        return False
    if K % 2 == 0 or not (3 <= K <= 5):
        return False
    if lo != hi or lo != (K - 1) // 2 * dilation:
        return False
    if max(C_in, C_out) > 128:
        return False
    if len(x_shape) != 3:
        return False
    return True


def window_conv_fwd(x, weight, bias, lo, dilation, slope):
    """Forward: (B, T, C_in) -> (B, T, C_out), same-padding K-tap conv."""
    B, T, C_in = x.shape
    K, _, C_out = weight.shape
    H = _halo(max(lo, 1))
    S = _pick_tile(H)
    nT = max(-(-T // S), 1)
    n_s = max(-(-T // S), 1)
    n_h = max(-(-T // H), 1)
    r = S // H
    kernel = functools.partial(
        _fwd_kernel, S=S, H=H, K=K, dil=dilation, lo=lo, T=T, slope=slope,
        has_bias=bias is not None,
    )
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda b, t: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    # halo index maps (same edge-clamping as pallas_pd_block._halo_specs)
    in_specs = [
        pl.BlockSpec((1, H, C_in),
                     lambda b, t: (b, jnp.maximum(t * r - 1, 0), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, S, C_in),
                     lambda b, t: (b, jnp.minimum(t, n_s - 1), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H, C_in),
                     lambda b, t: (b, jnp.minimum((t + 1) * r, n_h - 1), 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x, x, x]
    for k in range(K):
        in_specs.append(full((C_in, C_out)))
        args.append(weight[k])
    if bias is not None:
        in_specs.append(full((1, C_out)))
        args.append(bias[None, :])
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, T, C_out), x.dtype),
        grid=(B, nT),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, S, C_out), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2 * H + S, C_in), x.dtype)],
        interpret=_interpret(),
    )(*args)


def window_conv_wgrad(x, g, K, lo, dilation, slope, C_out):
    """dw (K, C_in, C_out) f32 and db (C_out,) f32 from input x and
    cotangent g, without materializing a tap operand."""
    B, T, C_in = x.shape
    H = _halo(max(lo, 1))
    S = _pick_tile(H)
    nT = max(-(-T // S), 1)
    n_s = max(-(-T // S), 1)
    n_h = max(-(-T // H), 1)
    r = S // H
    kernel = functools.partial(
        _wgrad_kernel, S=S, H=H, K=K, dil=dilation, lo=lo, T=T, slope=slope
    )
    dw, db = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((K * C_in, C_out), jnp.float32),
            jax.ShapeDtypeStruct((1, C_out), jnp.float32),
        ),
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec((1, H, C_in),
                         lambda b, t: (b, jnp.maximum(t * r - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, C_in),
                         lambda b, t: (b, jnp.minimum(t, n_s - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, C_in),
                         lambda b, t: (b, jnp.minimum((t + 1) * r, n_h - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, C_out), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((K * C_in, C_out), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C_out), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * H + S, C_in), x.dtype),
            pltpu.VMEM((K * C_in, C_out), jnp.float32),
            pltpu.VMEM((1, C_out), jnp.float32),
        ],
        interpret=_interpret(),
    )(x, x, x, g)
    return dw.reshape(K, C_in, C_out), db[0]


def window_conv_dx(g, weight, lo, dilation):
    """dx = same-padding conv of the cotangent with the reversed,
    transposed weight (no activation inside; the caller applies the
    leaky mask)."""
    w_rev = jnp.flip(weight, axis=0).transpose(0, 2, 1)
    return window_conv_fwd(g, w_rev, None, lo, dilation, None)
