"""HN-uSFGAN vocoder parity vs the reference torch implementation."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from conftest import make_reference_importable
from svcc23_fastsvc_tpu.compat import convert_hnusfgan
from svcc23_fastsvc_tpu.models.hnusfgan import HNUSFGANGenerator, pd_indexing

HAS_REF = make_reference_importable()
pytestmark = pytest.mark.skipif(not HAS_REF, reason="reference tree not present")

RNG = np.random.default_rng(31)


def test_pd_indexing_parity():
    from harana.utils import index_initial, pd_indexing as ref_pd

    B, C, T = 2, 4, 40
    x = torch.randn(B, C, T)
    d = torch.rand(B, 1, T) * 3 + 0.3
    bi, ci = index_initial(B, C)
    for dilation in (1, 2, 4):
        xP_ref, xF_ref = ref_pd(x, d, dilation, bi, ci)
        xP, xF = pd_indexing(
            jnp.asarray(np.moveaxis(x.numpy(), 1, -1)),
            jnp.asarray(d.numpy()[:, 0, :]),
            dilation,
        )
        np.testing.assert_allclose(
            np.asarray(xP), np.moveaxis(xP_ref.numpy(), 1, -1), atol=1e-6,
            err_msg=f"past d={dilation}",
        )
        np.testing.assert_allclose(
            np.asarray(xF), np.moveaxis(xF_ref.numpy(), 1, -1), atol=1e-6,
            err_msg=f"future d={dilation}",
        )


def test_pd_indexing_framewise_matches():
    """Framewise slice gather == per-sample gather for frame-constant d,
    incl. sequence-boundary masking and large lags."""
    from svcc23_fastsvc_tpu.models.hnusfgan import pd_indexing_framewise

    rng = np.random.default_rng(0)
    B, C, hop, F = 2, 3, 10, 12
    T = hop * F
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    d_frame = rng.uniform(0.3, 9.7, (B, F))  # lags up to ~39 samples at dil 4
    d = jnp.asarray(np.repeat(d_frame, hop, axis=1), jnp.float32)
    from svcc23_fastsvc_tpu.models.hnusfgan import pd_indexing

    for dilation in (1, 2, 4):
        want = pd_indexing(x, d, dilation)
        got = pd_indexing_framewise(x, d, dilation, hop)
        for w, g, name in zip(want, got, ("past", "future")):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), atol=1e-6,
                err_msg=f"{name} dil={dilation}",
            )

    # non-divisible T falls back to the exact per-sample path
    xs = x[:, :-3]
    ds = d[:, :-3]
    want = pd_indexing(xs, ds, 2)
    got = pd_indexing_framewise(xs, ds, 2, hop)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]))


def _small_cfg():
    return dict(
        harmonic_network_params={
            "blockA": 2, "cycleA": 2, "blockF": 0, "cycleF": 0,
            "cascade_mode": 0,
        },
        noise_network_params={
            "blockA": 0, "cycleA": 0, "blockF": 2, "cycleF": 2,
            "cascade_mode": 0,
        },
        filter_network_params={
            "blockA": 0, "cycleA": 0, "blockF": 3, "cycleF": 3,
            "cascade_mode": 0,
        },
        # NB: the reference's DEFAULT periodicity params use the key
        # "conv_blocks", which PeriodicityEstimator does not accept
        # (hnusfgan.py:62-67 vs residual_block.py:377-384) — the defaults
        # crash; real configs must pass conv_layers.
        periodicity_estimator_params={
            "conv_layers": 3, "kernel_size": 5, "dilation": 1,
            "residual_channels": 8,
            "padding_mode": "replicate",
        },
        residual_channels=8,
        gate_channels=16,
        skip_channels=8,
        aux_channels=10,
        aux_context_window=2,
        upsample_params={"upsample_scales": [4, 5]},
    )


def test_hnusfgan_parity():
    from harana.models.hnusfgan import HNUSFGANGenerator as RefGen

    cfg = _small_cfg()
    torch.manual_seed(13)
    ref = RefGen(**{k: v for k, v in cfg.items()}).eval()

    model = HNUSFGANGenerator(
        harmonic_params=cfg["harmonic_network_params"],
        noise_params=cfg["noise_network_params"],
        filter_params=cfg["filter_network_params"],
        residual_channels=8, gate_channels=16, skip_channels=8,
        aux_channels=10, aux_context_window=2, upsample_scales=(4, 5),
    )
    params = convert_hnusfgan(ref.state_dict(), n_up_scales=2)

    B = 2
    Tf = 12  # frames incl. 2*acw context
    hop = 20
    T = (Tf - 4) * hop
    x = torch.randn(B, 2, T) * 0.1
    c = torch.randn(B, 10, Tf)
    d = torch.rand(B, 1, T) * 2 + 0.5

    with torch.no_grad():
        want_x, want_s = ref(x, c, d)

    got_x, got_s = model.apply(
        params,
        jnp.asarray(np.moveaxis(x.numpy(), 1, -1)),
        jnp.asarray(np.moveaxis(c.numpy(), 1, -1)),
        jnp.asarray(d.numpy()[:, 0, :]),
    )
    np.testing.assert_allclose(
        np.asarray(got_x), np.moveaxis(want_x.numpy(), 1, -1),
        rtol=2e-3, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(got_s), np.moveaxis(want_s.numpy(), 1, -1),
        rtol=2e-3, atol=2e-4,
    )
