"""Fused Pallas dilated-conv kernels for the generator's hot 1-D convs.

Why this exists: the stride-1 small-channel convs that dominate the FastSVC
step (reference harana/models/fastsvc.py:80-193 — K=3, dilations 1..27,
24-192 channels at up to 24 kHz sample rate) are HBM-bound under every XLA
lowering we measured. The shifted-slice taps einsum (ops/conv.py) is the
fastest XLA form, but XLA materializes the (B, T, K*C) tap operand in HBM:
the forward moves ~8 tensor-passes per conv and the backward ~11. These
kernels build the taps inside VMEM from a (left-halo | main | right-halo)
window so the forward reads x once and writes y once, and ONE fused
backward kernel reads (x, g) once each, writes dx, and accumulates the
weight+bias gradient in a revisited f32 VMEM block — with the bias gradient
riding as a ones-column of the same wgrad contraction.

Numerics match ops.conv.conv1d (same cross-correlation; f32 accumulation;
bias folded into the matmul as a ones-column tap). An optional fused
leaky-relu on the *input* absorbs the model's conv(leaky(h)) pattern; its
derivative is applied in-kernel from the saved x tile, so no pre-activation
tensor ever materializes.

Layout notes (pallas_guide.md): blocks are (1, S, C) with C on the 128-lane
axis — DMA moves only the real C columns, lane padding exists only in VMEM.
The time tile S is chosen as a divisor of T so no padded tail ever needs a
slice-copy; halo blocks are fixed 64 samples, covering the largest reach
(K-1)*dilation = 54 of the d=27 convs. Edge/clamped halo blocks may carry
garbage (even NaNs); every tap value is routed through a positional
where-select, which is NaN-safe, before touching the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HALO = 64  # covers the largest span (K-1)*dilation = 54 (d=27, K=3)


def _interpret() -> bool:
    try:
        return jax.default_backend() != "tpu"
    except Exception:
        return True


@functools.lru_cache(maxsize=None)
def _pick_tile(T: int, C: int):
    """Time tile: a multiple of 64 near the ~64k-element VMEM sweet spot.

    Prefers a divisor of T (no padded edge block at all); otherwise any
    multiple of 64 — Pallas pads the last partial block, the kernels'
    positional where-selects zero the padded reads, and pad-region writes
    are discarded on copy-out. The production 24 kHz geometry (frame axes
    150/750/3000/12000 per 1-s crop) has no 64-divisible level except the
    final 24000, so divisor-only gating would idle the kernel at almost
    every hot conv. None only for tiny rows (< 256)."""
    if T < 256:
        return None
    target = max(256, min(4096, (1 << 16) // max(C, 1)))
    best = None
    if T % 64 == 0:
        for m in range(1, min(T // 64, 128) + 1):
            S = 64 * m
            if T % S or not 256 <= S <= 8192:
                continue
            if best is None or abs(S - target) < abs(best - target):
                best = S
    if best is None:
        cap = -(-T // 64) * 64  # single padded block at most
        best = max(256, min((target // 64) * 64, cap))
    return best


def _leaky(x, slope: float):
    return jnp.where(x >= 0, x, x * slope)


def _window(xl, xm, xr, t, S, T_src, slope):
    """Assemble W[i] == x[t*S - H + i] (zeros outside [0, T_src))."""
    W = jnp.concatenate([xl[0], xm[0], xr[0]], axis=0)  # (2H+S, C)
    if slope is not None:
        W = _leaky(W, slope)
    pos = jax.lax.broadcasted_iota(jnp.int32, W.shape, 0) + (t * S - _HALO)
    return jnp.where((pos >= 0) & (pos < T_src), W, jnp.zeros_like(W))


def _taps(W, K, d, lo, S, with_ones):
    """(2H+S, C) window -> (S, K*C [+1]) tap operand, lane-axis concat.

    Each tap column is built by rotating the window so the tap's start row
    lands at row 0, then slicing rows [0, S). Slicing at the shifted start
    directly (slice_in_dim(W, start, start+S)) gives every column a
    different sublane offset, and Mosaic's tpu.concatenate cannot relayout
    offset-mismatched inputs on the non-concat dim ("result/input offset
    mismatch", observed on a real v5e). After the rotate all columns are
    offset-0, so the lane-axis concat lowers cleanly. No wraparound rows
    can reach the slice: shift <= H + (K-1)*d <= 2*H for every supported
    config, so rows [0, S) of the rotated window are original rows
    [shift, shift+S) <= 2H+S.
    """
    L = W.shape[0]
    cols = []
    for k in range(K):
        shift = _HALO - lo + k * d
        # pltpu.roll takes a non-negative rotate-forward amount; forward by
        # L - shift == backward by shift.
        Wr = pltpu.roll(W, L - shift, 0) if shift else W
        cols.append(jax.lax.slice_in_dim(Wr, 0, S))
    if with_ones:
        cols.append(jnp.ones((S, 1), W.dtype))
    return jnp.concatenate(cols, axis=-1)


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_t(a, b):
    """a (S, M), b (S, N) -> (M, N): contraction over the tile axis."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _fwd_kernel(xl, xm, xr, w2, o, *, K, d, lo, S, T_in, slope, has_bias):
    t = pl.program_id(1)
    W = _window(xl, xm, xr, t, S, T_in, slope)
    taps = _taps(W, K, d, lo, S, with_ones=has_bias)
    o[0] = _dot(taps, w2[...]).astype(o.dtype)


def _bwd_kernel(
    xl, xm, xr, gl, gm, gr, w2r, dx, dw2,
    *, K, d, lo, S, T_in, T_out, slope, has_bias,
):
    b, t = pl.program_id(0), pl.program_id(1)
    span = (K - 1) * d

    @pl.when((b == 0) & (t == 0))
    def _init():
        dw2[...] = jnp.zeros_like(dw2)

    # wgrad (+ bias grad as the ones column): taps(x)^T @ g over this tile,
    # accumulated f32 across the whole grid in the revisited output block.
    Wx = _window(xl, xm, xr, t, S, T_in, slope)
    taps_x = _taps(Wx, K, d, lo, S, with_ones=has_bias)
    g = gm[0]
    pos_o = jax.lax.broadcasted_iota(jnp.int32, g.shape, 0) + t * S
    g = jnp.where(pos_o < T_out, g, jnp.zeros_like(g))
    dw2[...] += _dot_t(taps_x, g)

    # input grad: transposed conv of g in the same taps form, times the
    # fused activation's derivative from the saved x tile.
    Wg = _window(gl, gm, gr, t, S, T_out, None)
    taps_g = _taps(Wg, K, d, span - lo, S, with_ones=False)
    dxv = _dot(taps_g, w2r[...])
    if slope is not None:
        dxv = dxv * jnp.where(
            xm[0] >= 0, jnp.float32(1.0), jnp.float32(slope)
        )
    dx[0] = dxv.astype(dx.dtype)


def _specs(S, C, T_src):
    """(left halo, main, right halo) BlockSpecs over a (B, T_src, C) array.

    Index maps clamp at the edges, so edge blocks re-read in-range data (or
    Pallas pads with garbage past the array end); the kernel's positional
    where-select makes both harmless.
    """
    r = S // _HALO
    n_h = max(-(-T_src // _HALO), 1)
    n_s = max(-(-T_src // S), 1)

    def left(b, t):
        return (b, jnp.maximum(t * r - 1, 0), 0)

    def main(b, t):
        return (b, jnp.minimum(t, n_s - 1), 0)

    def right(b, t):
        return (b, jnp.minimum((t + 1) * r, n_h - 1), 0)

    return [
        pl.BlockSpec((1, _HALO, C), left, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, S, C), main, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, _HALO, C), right, memory_space=pltpu.VMEM),
    ]


def _fwd_call(x, weight, bias, lo, hi, d, slope):
    B, T_in, C_in = x.shape
    K, _, C_out = weight.shape
    T_out = T_in + lo + hi - (K - 1) * d
    S = _pick_tile(T_out, max(C_in, C_out))
    if S is None:
        raise ValueError(f"no usable tile for T_out={T_out}")
    nT = -(-T_out // S)
    w2 = weight.reshape(K * C_in, C_out)
    if bias is not None:
        w2 = jnp.concatenate([w2, bias[None].astype(w2.dtype)], axis=0)
    kernel = functools.partial(
        _fwd_kernel, K=K, d=d, lo=lo, S=S, T_in=T_in, slope=slope,
        has_bias=bias is not None,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, T_out, C_out), x.dtype),
        grid=(B, nT),
        in_specs=_specs(S, C_in, T_in)
        + [
            pl.BlockSpec(
                w2.shape, lambda b, t: (0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (1, S, C_out), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(x, x, x, w2)


def _bwd_call(x, g, weight, lo, hi, d, slope, has_bias):
    B, T_in, C_in = x.shape
    K, _, C_out = weight.shape
    T_out = g.shape[1]
    S = _pick_tile(T_in, max(C_in, C_out))
    if S is None:
        raise ValueError(f"no usable tile for T_in={T_in}")
    nT = -(-T_in // S)
    w2r = weight[::-1].transpose(0, 2, 1).reshape(K * C_out, C_in)
    kernel = functools.partial(
        _bwd_kernel, K=K, d=d, lo=lo, S=S, T_in=T_in, T_out=T_out,
        slope=slope, has_bias=has_bias,
    )
    dx, dw2 = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, T_in, C_in), x.dtype),
            jax.ShapeDtypeStruct(
                (K * C_in + int(has_bias), C_out), jnp.float32
            ),
        ),
        grid=(B, nT),
        in_specs=_specs(S, C_in, T_in)
        + _specs(S, C_out, T_out)
        + [
            pl.BlockSpec(
                w2r.shape, lambda b, t: (0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=(
            pl.BlockSpec(
                (1, S, C_in), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (K * C_in + int(has_bias), C_out),
                lambda b, t: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        interpret=_interpret(),
    )(x, x, x, g, g, g, w2r)
    return dx, dw2


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def pallas_conv1d(x, weight, bias, lo, hi, dilation, act_slope):
    """Fused stride-1 conv1d: y = conv(leaky(x) if act_slope else x, w) + b.

    x (B, T, C_in), weight (K, C_in, C_out), bias (C_out,) or None.
    Cross-correlation with (lo, hi) zero padding and rhs dilation — same
    numerics as ops.conv.conv1d. act_slope None disables the fused input
    activation; a float applies leaky_relu(x, act_slope) before the conv.
    """
    return _fwd_call(x, weight, bias, lo, hi, dilation, act_slope)


def _vjp_fwd(x, weight, bias, lo, hi, dilation, act_slope):
    out = _fwd_call(x, weight, bias, lo, hi, dilation, act_slope)
    return out, (x, weight, bias is not None)


def _vjp_bwd(lo, hi, dilation, act_slope, res, g):
    x, weight, has_bias = res
    K, C_in, C_out = weight.shape
    dx, dw2 = _bwd_call(x, g, weight, lo, hi, dilation, act_slope, has_bias)
    dw = dw2[: K * C_in].reshape(K, C_in, C_out).astype(weight.dtype)
    db = dw2[K * C_in].astype(weight.dtype) if has_bias else None
    return dx, dw, db


pallas_conv1d.defvjp(_vjp_fwd, _vjp_bwd)


def pallas_conv1d_supported(
    x_shape, w_shape, *, stride, groups, lo, hi, dilation
) -> bool:
    """Gate: shapes/configs this kernel handles (and wins on)."""
    if stride != 1 or groups != 1 or len(x_shape) != 3:
        return False
    K = w_shape[0]
    span = (K - 1) * dilation
    if not 2 <= K <= 5 or span > _HALO:
        return False
    if lo < 0 or hi < 0 or max(lo, hi) > _HALO:
        return False
    if lo + hi != span:  # only "same"-length convs (T_out == T_in)
        return False
    T = x_shape[1]
    if T < 256:  # tiny rows: grid/dispatch overhead beats the traffic win
        return False
    return _pick_tile(T, max(w_shape[1], w_shape[2])) is not None
