"""Fused Pallas dilated-conv kernels for the generator's hot 1-D convs.

Why this exists: the stride-1 small-channel convs that dominate the FastSVC
step (reference harana/models/fastsvc.py:80-193 — K=3, dilations 1..27,
24-192 channels at up to 24 kHz sample rate) are HBM-bound under every XLA
lowering we measured. The shifted-slice taps einsum (ops/conv.py) is the
fastest XLA form, but XLA materializes the (B, T, K*C) tap operand in HBM:
the forward moves ~8 tensor-passes per conv and the backward ~11. These
kernels assemble the window inside VMEM from a (left-halo | main |
right-halo) block triple so the forward reads x once and writes y once,
and ONE fused backward kernel reads (x, g) once each, writes dx, and
accumulates the weight and bias gradients in revisited f32 VMEM blocks.
Each tap is an offset slice of the window feeding its own per-tap
dot_general (round 3 rewrite: the original single wide matmul over a
lane-concat of rolled taps spent more VPU time rolling than the matmul
saved — 339 vs 156 ms/step f32 on a v5e — and Mosaic's rotate rejects
bf16 data outright).

Numerics match ops.conv.conv1d at matmul precision class (same
cross-correlation; f32 accumulation). An optional fused leaky-relu on the
*input* absorbs the model's conv(leaky(h)) pattern; its derivative is
applied in-kernel from the saved x tile, so no pre-activation tensor ever
materializes.

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
    # predicate in f32: Mosaic rejects bf16 comparisons ("Target does not
    # support this comparison", v5e)
    return jnp.where(x.astype(jnp.float32) >= 0, x, x * slope)


def _window(xl, xm, xr, t, S, T_src, slope):
    """Assemble W[i] == x[t*S - H + i] (zeros outside [0, T_src))."""
    W = jnp.concatenate([xl[0], xm[0], xr[0]], axis=0)  # (2H+S, C)
    if slope is not None:
        W = _leaky(W, slope)
    pos = jax.lax.broadcasted_iota(jnp.int32, W.shape, 0) + (t * S - _HALO)
    return jnp.where((pos >= 0) & (pos < T_src), W, jnp.zeros_like(W))


def _tap(W, k, d, lo, S):
    """Tap column k of the window: rows [shift, shift+S), shift >= 0.

    Columns are consumed by per-tap dots, NOT concatenated: a lane-axis
    concat needs all columns at the same sublane offset, which required a
    pltpu.roll per tap — measured on a v5e at 2.2x the whole-step time of
    the XLA path (rolls are pure VPU overhead; ADVICE r2), and Mosaic's
    rotate rejects bf16 outright. Offset slices feeding dot_general lower
    cleanly.
    """
    shift = _HALO - lo + k * d
    return jax.lax.slice_in_dim(W, shift, shift + S)


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_t(a, b):
    """a (S, M), b (S, N) -> (M, N): contraction over the tile axis."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _fwd_kernel(xl, xm, xr, w, b_ref, o, *, K, d, lo, S, T_in, slope,
                has_bias):
    t = pl.program_id(1)
    W = _window(xl, xm, xr, t, S, T_in, slope)
    acc = _dot(_tap(W, 0, d, lo, S), w[0])
    for k in range(1, K):
        acc = acc + _dot(_tap(W, k, d, lo, S), w[k])
    if has_bias:
        acc = acc + b_ref[...].astype(jnp.float32)
    o[0] = acc.astype(o.dtype)


def _bwd_kernel(
    xl, xm, xr, gl, gm, gr, w, dx, dw, db,
    *, K, d, lo, S, T_in, T_out, slope, has_bias,
):
    b, t = pl.program_id(0), pl.program_id(1)
    span = (K - 1) * d

    @pl.when((b == 0) & (t == 0))
    def _init():
        dw[...] = jnp.zeros_like(dw)
        if has_bias:
            db[...] = jnp.zeros_like(db)

    # wgrad: per-tap contraction tap_k(x)^T @ g over this tile, accumulated
    # f32 across the whole grid in the revisited output blocks. Register-
    # accumulate then ONE whole-ref += per output: Mosaic rejects
    # read-modify-write on an indexed sub-block of a ref fused with a dot
    # ("only constant accumulators supported", v5e).
    Wx = _window(xl, xm, xr, t, S, T_in, slope)
    g = gm[0]
    pos_o = jax.lax.broadcasted_iota(jnp.int32, g.shape, 0) + t * S
    g = jnp.where(pos_o < T_out, g, jnp.zeros_like(g))
    dw[...] += jnp.stack(
        [_dot_t(_tap(Wx, k, d, lo, S), g) for k in range(K)]
    )
    if has_bias:
        db[...] += _dot_t(jnp.ones((S, 1), g.dtype), g)

    # input grad: transposed conv of g in the same per-tap form (reversed
    # kernel, flipped pads), times the fused activation's derivative from
    # the saved x tile.
    Wg = _window(gl, gm, gr, t, S, T_out, None)
    dxv = _dot(_tap(Wg, 0, d, span - lo, S), w[K - 1].T)
    for k in range(1, K):
        dxv = dxv + _dot(_tap(Wg, k, d, span - lo, S), w[K - 1 - k].T)
    if slope is not None:
        dxv = dxv * jnp.where(
            xm[0].astype(jnp.float32) >= 0, jnp.float32(1.0),
            jnp.float32(slope),
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
    b_arr = (bias if bias is not None
             else jnp.zeros((C_out,), x.dtype))[None, :]
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
                weight.shape, lambda b, t: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                b_arr.shape, lambda b, t: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, S, C_out), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(x, x, x, weight, b_arr)


def _bwd_call(x, g, weight, lo, hi, d, slope, has_bias):
    B, T_in, C_in = x.shape
    K, _, C_out = weight.shape
    T_out = g.shape[1]
    S = _pick_tile(T_in, max(C_in, C_out))
    if S is None:
        raise ValueError(f"no usable tile for T_in={T_in}")
    nT = -(-T_in // S)
    kernel = functools.partial(
        _bwd_kernel, K=K, d=d, lo=lo, S=S, T_in=T_in, T_out=T_out,
        slope=slope, has_bias=has_bias,
    )
    dx, dw, db = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, T_in, C_in), x.dtype),
            jax.ShapeDtypeStruct((K, C_in, C_out), jnp.float32),
            jax.ShapeDtypeStruct((1, C_out), jnp.float32),
        ),
        grid=(B, nT),
        in_specs=_specs(S, C_in, T_in)
        + _specs(S, C_out, T_out)
        + [
            pl.BlockSpec(
                weight.shape, lambda b, t: (0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=(
            pl.BlockSpec(
                (1, S, C_in), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (K, C_in, C_out), lambda b, t: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, C_out), lambda b, t: (0, 0), memory_space=pltpu.VMEM
            ),
        ),
        interpret=_interpret(),
    )(x, x, x, g, g, g, weight)
    return dx, dw, db


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
    dx, dw, db = _bwd_call(x, g, weight, lo, hi, dilation, act_slope,
                           has_bias)
    dw = dw.astype(weight.dtype)
    db = db[0].astype(weight.dtype) if has_bias else None
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
