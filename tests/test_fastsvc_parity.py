"""End-to-end numerical parity vs the reference PyTorch models.

Builds reference modules with random torch weights, converts the state dict
with svcc23_fastsvc_tpu.compat, and asserts allclose on forward outputs.
This validates both the architecture re-implementation and the weight
converter (the path real reference checkpoints will take).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from conftest import make_reference_importable
from svcc23_fastsvc_tpu.compat import (
    convert_fastsvc_generator,
    convert_hifigan_msd_mpd,
    convert_melgan_msd,
)
from svcc23_fastsvc_tpu.models.fastsvc import (
    FastSVCGenerator,
    HiFiGANMultiScaleMultiPeriodDiscriminator,
    MelGANMultiScaleDiscriminator,
)
from svcc23_fastsvc_tpu.ops import fold_weight_norm

HAS_REF = make_reference_importable()
pytestmark = pytest.mark.skipif(not HAS_REF, reason="reference tree not present")

RNG = np.random.default_rng(42)


def _to_nwc(x_torch):
    return jnp.asarray(np.moveaxis(x_torch.detach().numpy(), 1, -1))


def _make_ref_generator(**kw):
    from harana.models.fastsvc import FastSVCGenerator as RefGen

    torch.manual_seed(0)
    return RefGen(**kw)


@pytest.mark.parametrize("use_spk_emb", [True, False])
def test_generator_parity_small(use_spk_emb):
    """Small config exercises all four block types and the FiLM fusion."""
    kw = dict(
        in_channels=8,
        mid_channels=[16, 8],
        upsampling_scales=[4, 5],
        spk_emb_size=12,
        use_spk_emb=use_spk_emb,
    )
    ref = _make_ref_generator(**kw)
    params = convert_fastsvc_generator(ref.state_dict())
    model = FastSVCGenerator(
        in_channels=8, mid_channels=(16, 8), upsampling_scales=(4, 5),
        spk_emb_size=12, use_spk_emb=use_spk_emb,
    )

    B, Tf = 2, 10
    hop = 20
    ppg = torch.randn(B, 8, Tf)
    sine = torch.randn(B, 1, Tf * hop)
    lft = torch.randn(B, 1, Tf * hop)
    emb = torch.randn(B, 12) if use_spk_emb else None

    with torch.no_grad():
        want = ref(ppg, sine, lft, emb)

    got = model.apply(
        params,
        _to_nwc(ppg),
        _to_nwc(sine),
        _to_nwc(lft),
        jnp.asarray(emb.numpy()) if emb is not None else None,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.moveaxis(want.numpy(), 1, -1), rtol=1e-4, atol=1e-4
    )


def test_generator_parity_full_config():
    """The production 16 kHz config (conf/fastsvc.yaml:23-30), short window."""
    kw = dict(
        in_channels=144,
        mid_channels=[192, 96, 48, 24],
        upsampling_scales=[2, 4, 4, 5],
        spk_emb_size=512,
        use_spk_emb=True,
    )
    ref = _make_ref_generator(**kw)
    params = convert_fastsvc_generator(ref.state_dict())
    model = FastSVCGenerator()

    B, Tf, hop = 1, 25, 160
    ppg = torch.randn(B, 144, Tf)
    sine = torch.randn(B, 1, Tf * hop)
    lft = torch.randn(B, 1, Tf * hop)
    emb = torch.randn(B, 512)

    with torch.no_grad():
        want = ref(ppg, sine, lft, emb)
    got = model.apply(
        params, _to_nwc(ppg), _to_nwc(sine), _to_nwc(lft), jnp.asarray(emb.numpy())
    )
    np.testing.assert_allclose(
        np.asarray(got), np.moveaxis(want.numpy(), 1, -1), rtol=2e-4, atol=2e-4
    )


def test_generator_fold_weight_norm_matches():
    """fold_weight_norm == reference remove_weight_norm."""
    kw = dict(
        in_channels=8, mid_channels=[16, 8], upsampling_scales=[4, 5],
        spk_emb_size=12, use_spk_emb=True,
    )
    ref = _make_ref_generator(**kw)
    params = convert_fastsvc_generator(ref.state_dict())
    folded = fold_weight_norm(params)
    ref.remove_weight_norm()
    params_removed = convert_fastsvc_generator(ref.state_dict())

    model = FastSVCGenerator(
        in_channels=8, mid_channels=(16, 8), upsampling_scales=(4, 5),
        spk_emb_size=12, use_spk_emb=True,
    )
    ppg = jnp.asarray(RNG.standard_normal((1, 10, 8)), jnp.float32)
    sine = jnp.asarray(RNG.standard_normal((1, 200, 1)), jnp.float32)
    lft = jnp.asarray(RNG.standard_normal((1, 200, 1)), jnp.float32)
    emb = jnp.asarray(RNG.standard_normal((1, 12)), jnp.float32)
    a = model.apply(folded, ppg, sine, lft, emb)
    b = model.apply(params_removed, ppg, sine, lft, emb)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_generator_fused_film_matches_unfused():
    """fuse_film=True (inference FiLM fusion) == the per-signal conv path;
    the fusion only reassociates the scale/shift sums."""
    import dataclasses

    import jax

    model = FastSVCGenerator(
        in_channels=8, mid_channels=(16, 8), upsampling_scales=(4, 5),
        spk_emb_size=12, use_spk_emb=True,
    )
    params = model.init(jax.random.PRNGKey(3))
    ppg = jnp.asarray(RNG.standard_normal((2, 10, 8)), jnp.float32)
    sine = jnp.asarray(RNG.standard_normal((2, 200, 1)), jnp.float32)
    lft = jnp.asarray(RNG.standard_normal((2, 200, 1)), jnp.float32)
    emb = jnp.asarray(RNG.standard_normal((2, 12)), jnp.float32)

    plain = model.apply(params, ppg, sine, lft, emb)
    fused = dataclasses.replace(model, fuse_film=True).apply(
        params, ppg, sine, lft, emb
    )
    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain),
                               rtol=1e-5, atol=1e-6)


def test_stack_downsample_matches_unstacked():
    """stack_downsample=True (both downsample chains as one vmapped
    program) is numerically the same computation."""
    import dataclasses

    import jax

    model = FastSVCGenerator(
        in_channels=8, mid_channels=(16, 8), upsampling_scales=(4, 5),
        spk_emb_size=12, use_spk_emb=True,
    )
    params = model.init(jax.random.PRNGKey(7))
    ppg = jnp.asarray(RNG.standard_normal((2, 10, 8)), jnp.float32)
    sine = jnp.asarray(RNG.standard_normal((2, 200, 1)), jnp.float32)
    lft = jnp.asarray(RNG.standard_normal((2, 200, 1)), jnp.float32)
    emb = jnp.asarray(RNG.standard_normal((2, 12)), jnp.float32)

    stacked = dataclasses.replace(model, stack_downsample=True)
    a = model.apply(params, ppg, sine, lft, emb)
    b = stacked.apply(params, ppg, sine, lft, emb)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)

    loss = lambda m: lambda p: jnp.sum(  # noqa: E731
        m.apply(p, ppg, sine, lft, emb) ** 2
    )
    ga = jax.grad(loss(model))(params)
    gb = jax.grad(loss(stacked))(params)
    scale = max(
        float(jnp.abs(x).max()) for x in jax.tree.leaves(ga)
    )
    for x, y in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        # tolerance relative to the GLOBAL grad scale: batched-matmul
        # reassociation perturbs near-zero leaves at ~1e-5 absolute
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-3, atol=1e-4 * scale
        )


def test_melgan_msd_parity():
    from harana.models.fastsvc import (
        MelGANMultiScaleDiscriminator as RefMSD,
    )

    # the fastsvc.yaml:35-52 discriminator config
    cfg = dict(
        in_channels=1,
        out_channels=1,
        scales=3,
        kernel_sizes=[5, 3],
        channels=16,
        max_downsample_channels=512,
        downsample_scales=[4, 4, 4],
    )
    torch.manual_seed(1)
    ref = RefMSD(**cfg)
    params = convert_melgan_msd(ref.state_dict(), scales=3)
    model = MelGANMultiScaleDiscriminator(
        scales=3, channels=16, max_downsample_channels=512,
        downsample_scales=(4, 4, 4),
    )

    x = torch.randn(2, 1, 3200)
    with torch.no_grad():
        want = ref(x)
    got = model.apply(params, _to_nwc(x))
    assert len(got) == len(want) == 3
    for scale_got, scale_want in zip(got, want):
        assert len(scale_got) == len(scale_want)
        for g, w in zip(scale_got, scale_want):
            np.testing.assert_allclose(
                np.asarray(g), np.moveaxis(w.numpy(), 1, -1), rtol=5e-4, atol=5e-4
            )


def test_hifigan_msd_mpd_parity():
    from harana.models.fastsvc import (
        HiFiGANMultiScaleMultiPeriodDiscriminator as RefD,
    )

    torch.manual_seed(2)
    ref = RefD()
    params = convert_hifigan_msd_mpd(ref.state_dict())
    model = HiFiGANMultiScaleMultiPeriodDiscriminator()

    x = torch.randn(1, 1, 960)
    with torch.no_grad():
        want = ref(x)
    got = model.apply(params, _to_nwc(x))
    assert len(got) == len(want) == 8
    for i, (g, w) in enumerate(zip(got, want)):
        wn = w.numpy()
        gn = np.asarray(g)
        if wn.ndim == 3:  # scale disc: (B, C, T) vs (B, T, C)
            wn = np.moveaxis(wn, 1, -1)
        np.testing.assert_allclose(gn, wn, rtol=5e-4, atol=5e-4, err_msg=f"disc {i}")
