"""Loss parity vs the reference torch loss modules."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from conftest import make_reference_importable
from svcc23_fastsvc_tpu.losses import (
    MultiResolutionSTFTLoss,
    discriminator_adversarial_loss,
    generator_adversarial_loss,
    masked_mse_loss,
)

HAS_REF = make_reference_importable()
RNG = np.random.default_rng(7)


@pytest.mark.skipif(not HAS_REF, reason="reference tree not present")
def test_multi_resolution_stft_loss_parity():
    from harana.losses import MultiResolutionSTFTLoss as RefLoss

    fft_sizes = [2048, 1024, 512, 256, 128, 64]
    hop_sizes = [512, 256, 128, 64, 32, 16]
    win_lengths = [2048, 1024, 512, 256, 128, 64]
    ref_loss = RefLoss(fft_sizes, hop_sizes, win_lengths)
    loss = MultiResolutionSTFTLoss(tuple(fft_sizes), tuple(hop_sizes), tuple(win_lengths))

    x = RNG.standard_normal((2, 16000)).astype(np.float32) * 0.1
    y = RNG.standard_normal((2, 16000)).astype(np.float32) * 0.1
    with torch.no_grad():
        sc_ref, mag_ref = ref_loss(torch.from_numpy(x), torch.from_numpy(y))
    sc, mag = loss(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(float(sc), sc_ref.item(), rtol=2e-3)
    np.testing.assert_allclose(float(mag), mag_ref.item(), rtol=2e-3)


@pytest.mark.skipif(not HAS_REF, reason="reference tree not present")
@pytest.mark.parametrize("loss_type", ["mse", "hinge"])
def test_adversarial_loss_parity(loss_type):
    from harana.losses import (
        DiscriminatorAdversarialLoss as RefD,
        GeneratorAdversarialLoss as RefG,
    )

    # nested (MelGAN-style) outputs: list of per-layer lists
    outs = [[torch.randn(2, 8, 5), torch.randn(2, 1, 5)] for _ in range(3)]
    outs_hat = [[torch.randn(2, 8, 5), torch.randn(2, 1, 5)] for _ in range(3)]

    with torch.no_grad():
        g_ref = RefG(loss_type=loss_type)(outs_hat)
        r_ref, f_ref = RefD(loss_type=loss_type)(outs_hat, outs)

    to_j = lambda nested: [[jnp.asarray(t.numpy()) for t in o] for o in nested]
    g = generator_adversarial_loss(to_j(outs_hat), loss_type=loss_type)
    r, f = discriminator_adversarial_loss(to_j(outs_hat), to_j(outs), loss_type=loss_type)
    np.testing.assert_allclose(float(g), g_ref.item(), rtol=1e-5)
    np.testing.assert_allclose(float(r), r_ref.item(), rtol=1e-5)
    np.testing.assert_allclose(float(f), f_ref.item(), rtol=1e-5)


def test_masked_mse_ignores_padding():
    x = jnp.asarray(RNG.standard_normal((2, 10, 4)), jnp.float32)
    y = jnp.asarray(RNG.standard_normal((2, 10, 4)), jnp.float32)
    lengths = jnp.asarray([10, 6])
    # corrupting padded region must not change the loss
    y_bad = y.at[1, 6:].set(1e6)
    a = masked_mse_loss(x, y, lengths)
    b = masked_mse_loss(x, y_bad, lengths)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-6)
    # and it equals the manual mean over valid elements
    manual = (
        np.square(np.asarray(x[0]) - np.asarray(y[0])).sum()
        + np.square(np.asarray(x[1, :6]) - np.asarray(y[1, :6])).sum()
    ) / ((10 + 6) * 4)
    np.testing.assert_allclose(float(a), manual, rtol=1e-5)
