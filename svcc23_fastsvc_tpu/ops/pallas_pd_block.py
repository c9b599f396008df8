"""Fused pitch-adaptive gated block for the HN-uSFGAN vocoder (inference).

Why this exists: the B02 vocoder's 20 AdaptiveBlocks dominate its synthesis
cost — 48.8 of 75.4 ms at the bench shape (B=8, T=24000, bf16, v5e), 2.44
ms/block vs 0.64 for a FixedBlock of equal matmul cost. The difference is
the pitch-dependent gather: XLA lowers the per-frame dynamic slices of
pd_indexing_framewise (models/hnusfgan.py) as a generic gather running at
~30 GB/s, and the block's five 1x1 convs each round-trip a (B, T, 128)
activation through HBM. This kernel fuses the whole block
(reference harana/layers/residual_block.py:176-266):

    h  = xC @ wC + xP @ wP + xF @ wF + c @ wA + b
    z  = tanh(h[:, :G/2]) * sigmoid(h[:, G/2:])
    y  = (z @ wO + bO + xC) * sqrt(0.5)

with xP/xF gathered from a (left-halo | main | right-halo) VMEM window by
per-frame dynamic slices (frame-constant shifts, the pd_frame_hop
contract), so each tile reads x and c once and writes y once. The halo is
sized per dilation by the caller (max pitch lag dil * fs / (f0_floor *
dense)); shifts are clamped to the halo on the host.

Inference-only: no custom VJP — the vocoder is a frozen pretrained model
in this pipeline (the reference trains it in the external usfgan repo).
Numerics: dots accumulate f32 (same MXU input-precision class as the XLA
path); gate/residual arithmetic in f32, output cast to the stream dtype.
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


def _kernel(shifts, xl, xm, xr, c, wC, wP, wF, wA, bg, wO, bO, y, W, xPb, xFb,
            *, S, H, hop, T, gather="roll"):
    b, t = pl.program_id(0), pl.program_id(1)
    nF_total = shifts.shape[1]
    R = xm.shape[-1]
    # window = [left halo | main | right halo | 16 zero rows], rows outside
    # [0, T) zeroed (pd_indexing's out-of-range-is-zero contract falls out
    # of this mask); the 16-row tail lets the aligned+16 slice below reach
    # the window's last legal start without clipping distortion
    W[0:H] = xl[0]
    W[H : H + S] = xm[0]
    W[H + S : 2 * H + S] = xr[0]
    pos = jax.lax.broadcasted_iota(
        jnp.int32, (2 * H + S + 16, R), 0
    ) + (t * S - H)
    W[...] = jnp.where((pos >= 0) & (pos < T), W[...], jnp.zeros_like(W))
    W[2 * H + S :] = jnp.zeros((16, R), W.dtype)

    # Per-frame pitch gather into contiguous (S, R) scratch; shifts is the
    # WHOLE (B, F) array in SMEM (TPU block tiling rejects sliced SMEM
    # blocks), indexed at the tile's global frame offset.
    #
    # Mosaic requires sublane-dim dynamic-slice starts provably divisible
    # by 8, and pitch shifts are arbitrary: slice at the aligned floor
    # (multiple of 16) with 16 extra rows, then rotate the residual 0..15
    # away with a dynamic pltpu.roll (in f32 — Mosaic rejects bf16
    # rotates; bf16->f32->bf16 is exact) and keep rows [0, hop).
    nF = S // hop
    L = hop + 16
    if gather == "mxu":
        # residual-shift one-hot (hop, L) permutation bases, built once
        # per tile: P_r = (j == i + r). The gather then becomes
        # P_r @ rows on the MXU — exact (0/1 matrix, f32 accumulate),
        # bf16-native (no upcast), and no pltpu.roll data movement.
        gi = jax.lax.broadcasted_iota(jnp.int32, (hop, L), 0)
        gj = jax.lax.broadcasted_iota(jnp.int32, (hop, L), 1)
    for f in range(nF):
        gf = jnp.minimum(t * nF + f, nF_total - 1)
        s = shifts[b, gf]
        base = H + f * hop

        if gather == "mxu":

            def unaligned(start):
                start = jnp.clip(start, 0, 2 * H + S - hop)
                q = pl.multiple_of((start // 16) * 16, 16)
                r = start - q
                rows = W[pl.ds(q, L), :]
                perm = (gj == gi + r).astype(W.dtype)
                return _dot(perm, rows).astype(W.dtype)

        else:

            def unaligned(start):
                start = jnp.clip(start, 0, 2 * H + S - hop)
                q = pl.multiple_of((start // 16) * 16, 16)
                r = start - q
                rows = W[pl.ds(q, L), :].astype(jnp.float32)
                rows = pltpu.roll(rows, L - r, 0)
                return rows[0:hop].astype(W.dtype)

        xPb[f * hop : (f + 1) * hop] = unaligned(base - s)
        xFb[f * hop : (f + 1) * hop] = unaligned(base + s)

    xC = W[H : H + S, :]
    h = (
        _dot(xC, wC[...])
        + _dot(xPb[...], wP[...])
        + _dot(xFb[...], wF[...])
        + _dot(c[0], wA[...])
        + bg[...].astype(jnp.float32)
    )
    G2 = h.shape[-1] // 2
    z = jnp.tanh(h[:, :G2]) * jax.nn.sigmoid(h[:, G2:])
    out = _dot(z.astype(xm.dtype), wO[...]) + bO[...].astype(jnp.float32)
    y[0] = ((out + xC.astype(jnp.float32)) * math.sqrt(0.5)).astype(y.dtype)


def _halo_specs(S, H, C, T_src):
    """(left halo, main, right halo) specs with edge-clamped index maps
    (same pattern as pallas_conv._specs, parameterized halo). Requires
    S % H == 0 so halo block indices stay aligned."""
    n_s = max(-(-T_src // S), 1)
    n_h = max(-(-T_src // H), 1)
    r = S // H

    def left_map(b, t):
        return (b, jnp.maximum(t * r - 1, 0), 0)

    def main_map(b, t):
        return (b, jnp.minimum(t, n_s - 1), 0)

    def right_map(b, t):
        return (b, jnp.minimum((t + 1) * r, n_h - 1), 0)

    return [
        pl.BlockSpec((1, H, C), left_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, S, C), main_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H, C), right_map, memory_space=pltpu.VMEM),
    ]


def _pick_tile(hop: int, H: int, target: int = 1536) -> int:
    """Tile = a multiple of the halo (block-index alignment) near `target`
    rows. H is hop-aligned, so the tile is automatically frame-aligned.
    Larger tiles amortize per-grid-step overhead, but the adaptive kernel
    OOMs scoped VMEM above ~2k rows (window + two gather buffers + f32
    gate temporaries); the fixed kernel's lighter footprint takes ~4k."""
    return H * max(1, -(-target // H))


def pd_block_halo(dilation: int, fs: int, dense: int = 4,
                  f0_floor: float = 37.5, hop: int = 160) -> int:
    """Static halo covering the largest pitch lag at this dilation: shift =
    round(d * dil), d = fs / (f0 * dense) <= fs / (f0_floor * dense).
    Rounded up to a multiple of hop so halo blocks tile the frame grid;
    the caller clamps shifts to this value (f0 below f0_floor is out of
    contract)."""
    reach = int(math.ceil(dilation * fs / (f0_floor * dense))) + 1
    # granularity: multiple of hop (frame-aligned blocks) AND 32 sublanes
    g = hop * 32 // math.gcd(hop, 32)
    return g * max(1, -(-reach // g))


def _fixed_kernel(xl, xm, xr, lpad, rpad, c, w0, w1, w2, wA, bg, wO, bO, y, W,
                  *, S, H, dil, T, r_ofs):
    t = pl.program_id(1)
    nT = pl.num_programs(1)
    # window = [left halo | main | right halo] over the UNPADDED stream;
    # global position of W row j is t*S - H + j. The reflect padding is
    # fused: edge tiles overwrite their out-of-range halo rows with the
    # host-precomputed reflected edge blocks (lpad covers [-H, 0), rpad
    # covers [T - (r_ofs % 32 origin shift), ...) — see pd_fixed_block),
    # so the full (B, T + 2*dil, R) XLA pad copy per block disappears.
    W[0:H] = xl[0]
    W[H : H + S] = xm[0]
    W[H + S :] = xr[0]

    @pl.when(t == 0)
    def _():
        W[0:H] = lpad[0]

    @pl.when(t == nT - 1)
    def _():
        W[r_ofs : r_ofs + H] = rpad[0]

    # VALID conv over the implicit padded stream: output row g (global
    # t*S + g) reads positions g - dil, g, g + dil -> W rows at static
    # offsets H - dil, H, H + dil. The center tap is also the residual.
    xC = W[H : H + S, :]
    h = (
        _dot(W[H - dil : H - dil + S, :], w0[...])
        + _dot(xC, w1[...])
        + _dot(W[H + dil : H + dil + S, :], w2[...])
        + _dot(c[0], wA[...])
        + bg[...].astype(jnp.float32)
    )
    G2 = h.shape[-1] // 2
    z = jnp.tanh(h[:, :G2]) * jax.nn.sigmoid(h[:, G2:])
    out = _dot(z.astype(xm.dtype), wO[...]) + bO[...].astype(jnp.float32)
    y[0] = ((out + xC.astype(jnp.float32)) * math.sqrt(0.5)).astype(y.dtype)


def fixed_block_halo(dilation: int) -> int:
    """Halo covering the K=3 VALID conv's reach dil per side plus 32 rows
    of store-alignment slack for the fused right-edge reflect block,
    32-sublane-aligned."""
    return 32 * max(2, -(-(dilation + 32) // 32))


def pd_fixed_block(x, c, params, *, dilation: int, halo: int):
    """Fused FixedBlock forward (reference residual_block.py:75-173) with
    the reflect padding fused into the kernel's window assembly.

    Args:
        x: (B, T, R) UNPADDED input, T % 32 == 0 (production streams are
            hop-160 aligned; the caller gates on this).
        c: (B, T, A) conditioning features.
        params: folded block params {"conv","aux","out"}; "conv" holds the
            (3, R, G) dilated-conv weight.
    Returns:
        (B, T, R) block output.
    """
    B, T, R = x.shape
    A = c.shape[-1]
    H = halo
    if T % 32 or dilation + 32 > H:
        raise ValueError("pd_fixed_block: T must be 32-aligned and halo "
                         ">= dilation + 32")
    S = _pick_tile(1, H, target=4096)
    nT = max(-(-T // S), 1)
    w = params["conv"]["w"]
    wA = params["aux"]["w"][0]
    bg = params["conv"]["b"][None, :]
    wO = params["out"]["w"][0]
    bO = params["out"]["b"][None, :]

    # Host-side reflected edge blocks (tiny: (B, H, R) each).
    # lpad: window rows [0, H) of tile 0 = global positions [-H, 0);
    # torch ReflectionPad1d: value at -k is x[k], so the last dil rows are
    # flip(x[:, 1:dil+1]) and the rest (never read) zeros.
    zeros_l = jnp.zeros((B, H - dilation, R), x.dtype)
    lpad = jnp.concatenate(
        [zeros_l, jnp.flip(x[:, 1 : dilation + 1], axis=1)], axis=1
    )
    # rpad: H rows stored at the 32-aligned offset at/below position T in
    # the last tile's window; covers [T - delta, T - delta + H) where
    # delta = (position of T in the window) % 32. Content: real rows
    # x[T-delta:T], then the reflection (value at T-1+k is x[T-1-k]), then
    # zero fill (positions beyond T + dil are never read).
    ofs = H + (T - (nT - 1) * S)
    delta = ofs % 32
    r_ofs = ofs - delta
    fill = H - delta - dilation
    rpad = jnp.concatenate(
        [
            x[:, T - delta : T],
            jnp.flip(x[:, T - dilation - 1 : T - 1], axis=1),
            jnp.zeros((B, fill, R), x.dtype),
        ],
        axis=1,
    )

    kernel = functools.partial(_fixed_kernel, S=S, H=H, dil=dilation,
                               T=T, r_ofs=r_ofs)
    full = lambda shape: [  # noqa: E731
        pl.BlockSpec(shape, lambda b, t: (0,) * len(shape),
                     memory_space=pltpu.VMEM)
    ]
    edge = lambda: [  # noqa: E731 — per-batch (1, H, R) edge block
        pl.BlockSpec((1, H, R), lambda b, t: (b, 0, 0),
                     memory_space=pltpu.VMEM)
    ]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, T, R), x.dtype),
        grid=(B, nT),
        in_specs=_halo_specs(S, H, R, T)
        + edge() + edge()
        + [
            pl.BlockSpec((1, S, A), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ]
        + full(w[0].shape) + full(w[1].shape) + full(w[2].shape)
        + full(wA.shape) + full(bg.shape) + full(wO.shape) + full(bO.shape),
        out_specs=pl.BlockSpec((1, S, R), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2 * H + S, R), x.dtype),
        ],
        interpret=_interpret(),
    )(x, x, x, lpad, rpad, c, w[0], w[1], w[2], wA, bg, wO, bO)


def fixed_chain_offsets(dilations):
    """Per-stage 32-aligned window offsets A_j for a fused chain of fixed
    blocks: stage j computes window rows [A_j, 2H+S-A_j) and reads stage
    j-1 at +-d_j, so A_j >= A_{j-1} + d_j (rounded to 32 sublanes for
    store alignment). H = A_K is the chain halo."""
    offs, cur = [], 0
    for d in dilations:
        cur = 32 * max(1, -(-(cur + d) // 32))
        offs.append(cur)
    return offs


def _flip_rows(vals):
    """Reverse the row (sublane) order of a (D, R) value. Mosaic has no
    `rev` lowering; an antidiagonal-permutation matmul (P[i,j] = 1 iff
    i + j == D-1) does it on the MXU, exactly (0/1 matrix, f32 accumulate,
    bf16 values round-trip exact)."""
    D = vals.shape[0]
    i = jax.lax.broadcasted_iota(jnp.int32, (D, D), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (D, D), 1)
    perm = (i + j == D - 1).astype(jnp.float32)
    return _dot(perm, vals.astype(jnp.float32)).astype(vals.dtype)


def _chain_kernel(xl, xm, xr, lpad, rpad, cl, cm, cr, W3, WA, BG, WO, BO, y,
                  Wa, Wb, Wc, *, S, H, dils, offs, T, r_ofs):
    t = pl.program_id(1)
    nT = pl.num_programs(1)
    K = len(dils)

    # window of the input stream over positions [t*S - H, t*S + S + H),
    # with the first block's reflect padding fused via the host-computed
    # edge blocks (same contract as pd_fixed_block)
    Wa[0:H] = xl[0]
    Wa[H : H + S] = xm[0]
    Wa[H + S :] = xr[0]

    @pl.when(t == 0)
    def _():
        Wa[0:H] = lpad[0]

    @pl.when(t == nT - 1)
    def _():
        Wa[r_ofs : r_ofs + H] = rpad[0]

    # conditioning window (halo rows feed the halo-range stage outputs;
    # out-of-[0,T) garbage only reaches rows the reflect fix-ups rewrite)
    Wc[0:H] = cl[0]
    Wc[H : H + S] = cm[0]
    Wc[H + S :] = cr[0]

    rT = H + T - (nT - 1) * S  # window row of global position T (last tile)
    bufs = (Wa, Wb)
    for i in range(K):
        src, dst = bufs[i % 2], bufs[(i + 1) % 2]
        a, d = offs[i], dils[i]
        L = 2 * H + S - 2 * a
        xC = src[a : a + L, :]
        h = (
            _dot(src[a - d : a - d + L, :], W3[i, 0])
            + _dot(xC, W3[i, 1])
            + _dot(src[a + d : a + d + L, :], W3[i, 2])
            + _dot(Wc[a : a + L, :], WA[i])
            + BG[i].astype(jnp.float32)
        )
        G2 = h.shape[-1] // 2
        z = jnp.tanh(h[:, :G2]) * jax.nn.sigmoid(h[:, G2:])
        out = _dot(z.astype(src.dtype), WO[i]) + BO[i].astype(jnp.float32)
        dst[a : a + L] = (
            (out + xC.astype(jnp.float32)) * math.sqrt(0.5)
        ).astype(dst.dtype)

        if i < K - 1:
            # the next stage reads this output `depth` rows past each
            # global edge; rewrite those rows with the reference's
            # ReflectionPad1d values (y[-k] = y[k], y[T-1+k] = y[T-1-k])
            depth = H - offs[i + 1] + dils[i + 1]

            @pl.when(t == 0)
            def _():
                dst[H - depth : H] = _flip_rows(dst[H + 1 : H + 1 + depth, :])

            @pl.when(t == nT - 1)
            def _():
                dst[rT : rT + depth] = _flip_rows(
                    dst[rT - 1 - depth : rT - 1, :]
                )

    final = bufs[K % 2]
    y[0] = final[H : H + S, :]


def pd_fixed_chain(x, c, params_list, *, dilations, tile_target: int = 3072):
    """Fused forward of a CHAIN of K FixedBlocks in one pallas_call
    (reference residual_block.py:75-173 applied K times back-to-back).

    The per-block kernel (pd_fixed_block) re-reads the (B, T, R) stream
    and the (B, T, A) conditioning from HBM and writes the stream back for
    EVERY block — 3 stream round-trips per block. Chaining K blocks reads
    x and c once and writes y once, with the K-1 intermediate streams kept
    in VMEM scratch; the extra halo compute is 2*(H - A_j)/S per stage
    (single-digit % at the production dilation cycles, whose halos are
    32*K rows). Reflect padding for EVERY stage is fused: the first
    block's via host edge blocks, later blocks' via in-kernel flips of
    their own in-window output rows.

    Args:
        x: (B, T, R) UNPADDED stream, T % 32 == 0.
        c: (B, T, A) conditioning.
        params_list: K folded block param dicts {"conv","aux","out"}.
        dilations: K static dilations (chain order).
    Returns:
        (B, T, R) output of block K.
    """
    B, T, R = x.shape
    A_ch = c.shape[-1]
    K = len(dilations)
    assert len(params_list) == K and K >= 1
    offs = fixed_chain_offsets(dilations)
    H = offs[-1]
    if T % 32:
        raise ValueError("pd_fixed_chain: T must be 32-aligned")
    if T < 2 * H:
        # with a short stream the left/right reflect fix-up row ranges can
        # overlap and silently deviate from sequential ReflectionPad
        # semantics; the model path gates on this (ResidualBlocks.apply),
        # direct callers get a hard error instead of wrong numerics
        raise ValueError(f"pd_fixed_chain: T ({T}) must be >= 2 * chain "
                         f"halo ({2 * H})")
    S = H * max(1, -(-tile_target // H))
    nT = max(-(-T // S), 1)

    W3 = jnp.stack([p["conv"]["w"] for p in params_list])         # (K,3,R,G)
    WA = jnp.stack([p["aux"]["w"][0] for p in params_list])       # (K,A,G)
    BG = jnp.stack([p["conv"]["b"][None, :] for p in params_list])
    WO = jnp.stack([p["out"]["w"][0] for p in params_list])       # (K,R,R)
    BO = jnp.stack([p["out"]["b"][None, :] for p in params_list])

    d1 = dilations[0]
    zeros_l = jnp.zeros((B, H - d1, R), x.dtype)
    lpad = jnp.concatenate(
        [zeros_l, jnp.flip(x[:, 1 : d1 + 1], axis=1)], axis=1
    )
    ofs = H + (T - (nT - 1) * S)
    delta = ofs % 32
    r_ofs = ofs - delta
    fill = H - delta - d1
    rpad = jnp.concatenate(
        [
            x[:, T - delta : T],
            jnp.flip(x[:, T - d1 - 1 : T - 1], axis=1),
            jnp.zeros((B, fill, R), x.dtype),
        ],
        axis=1,
    )

    kernel = functools.partial(_chain_kernel, S=S, H=H,
                               dils=tuple(dilations), offs=tuple(offs),
                               T=T, r_ofs=r_ofs)
    full = lambda shape: [  # noqa: E731
        pl.BlockSpec(shape, lambda b, t: (0,) * len(shape),
                     memory_space=pltpu.VMEM)
    ]
    edge = lambda: [  # noqa: E731 — per-batch (1, H, R) edge block
        pl.BlockSpec((1, H, R), lambda b, t: (b, 0, 0),
                     memory_space=pltpu.VMEM)
    ]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, T, R), x.dtype),
        grid=(B, nT),
        in_specs=_halo_specs(S, H, R, T)
        + edge() + edge()
        + _halo_specs(S, H, A_ch, T)
        + full(W3.shape) + full(WA.shape) + full(BG.shape)
        + full(WO.shape) + full(BO.shape),
        out_specs=pl.BlockSpec((1, S, R), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2 * H + S, R), x.dtype),
            pltpu.VMEM((2 * H + S, R), x.dtype),
            pltpu.VMEM((2 * H + S, A_ch), c.dtype),
        ],
        interpret=_interpret(),
    )(x, x, x, lpad, rpad, c, c, c, W3, WA, BG, WO, BO)


def _default_gather() -> str:
    """Pitch-gather lowering inside the adaptive kernel:
    FASTSVC_PD_GATHER = "roll" (16-aligned slice + f32 pltpu.roll) or
    "mxu" (16-aligned slice + one-hot permutation matmul, bf16-native).
    Default "roll" — the lowering behind the committed round-3/4 numbers
    — until the on-chip A/B (tools/adaptive_gather_ab.py) proves a
    winner; an unmeasured lowering never defaults on."""
    import os

    g = os.environ.get("FASTSVC_PD_GATHER", "roll")
    return g if g in ("roll", "mxu") else "roll"


def pd_adaptive_block(x, c, shifts, params, *, hop: int, halo: int,
                      gather: str | None = None):
    """Fused adaptive-block forward.

    Args:
        x: (B, T, R) residual stream (bf16 or f32), T % hop == 0.
        c: (B, T, A) upsampled conditioning features.
        shifts: (B, T // hop) int32 pitch shifts (round(d * dilation) per
            frame), pre-clamped to [0, halo] by the caller.
        params: folded (non-weight-norm) block params {"convC","convP",
            "convF","aux","out"} with {"w": (1, Cin, Cout)[, "b"]}.
        halo: static halo from pd_block_halo(dilation, fs).
        gather: per-frame pitch-gather lowering ("roll"/"mxu"); defaults
            to FASTSVC_PD_GATHER (see _default_gather).
    Returns:
        (B, T, R) block output.
    """
    if gather is None:
        gather = _default_gather()
    B, T, R = x.shape
    A = c.shape[-1]
    if T % hop:
        raise ValueError("T must be a multiple of hop")
    H = halo
    S = _pick_tile(hop, H)
    nT = -(-T // S)
    nF = S // hop
    wC = params["convC"]["w"][0]
    wP = params["convP"]["w"][0]
    wF = params["convF"]["w"][0]
    wA = params["aux"]["w"][0]
    bg = (params["convC"]["b"] + params["convP"]["b"]
          + params["convF"]["b"])[None, :]
    wO = params["out"]["w"][0]
    bO = params["out"]["b"][None, :]
    kernel = functools.partial(_kernel, S=S, H=H, hop=hop, T=T,
                               gather=gather)
    full = lambda shape: [  # noqa: E731 — replicated whole-array blocks
        pl.BlockSpec(shape, lambda b, t: (0,) * len(shape),
                     memory_space=pltpu.VMEM)
    ]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, T, R), x.dtype),
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec(shifts.shape, lambda b, t: (0, 0),
                         memory_space=pltpu.SMEM),
        ]
        + _halo_specs(S, H, R, T)
        + [
            pl.BlockSpec((1, S, A), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ]
        + full(wC.shape) + full(wP.shape) + full(wF.shape) + full(wA.shape)
        + full(bg.shape) + full(wO.shape) + full(bO.shape),
        out_specs=pl.BlockSpec((1, S, R), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2 * H + S + 16, R), x.dtype),
            pltpu.VMEM((S, R), x.dtype),
            pltpu.VMEM((S, R), x.dtype),
        ],
        interpret=_interpret(),
    )(shifts, x, x, x, c, wC, wP, wF, wA, bg, wO, bO)
