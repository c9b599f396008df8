"""B02 Tacotron2 + sub-frequency discriminator parity vs the reference."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from conftest import make_reference_importable
from svcc23_fastsvc_tpu.compat import (
    convert_subfreq_discriminator,
    convert_tacotron2,
)
from svcc23_fastsvc_tpu.models.tacotron2 import (
    MultiSubFreqDiscriminator,
    SubFreqDiscriminator,
    Tacotron2,
    bilstm,
)

HAS_REF = make_reference_importable()
pytestmark = pytest.mark.skipif(not HAS_REF, reason="reference tree not present")

RNG = np.random.default_rng(23)


def _ref_model(**kw):
    from harana.models.tacotron2 import Tacotron2 as RefT2

    torch.manual_seed(5)
    defaults = dict(
        input_dim=256, output_dim=60, hidden_dim=32, enc_layers=1,
        dec_layers=2, multi_speaker=True, spk_emb_dim=24,
        integrate_logf0=True, ar_mode=True, use_postnet=False,
        prenet_dropout_rate=0.0, dec_dropout_rate=0.0,
    )
    defaults.update(kw)
    m = RefT2(**defaults)
    # nontrivial running stats for eval-mode BN
    for mod in m.modules():
        if isinstance(mod, torch.nn.BatchNorm1d):
            mod.running_mean.normal_(0, 0.3)
            mod.running_var.uniform_(0.5, 2.0)
    return m.eval(), defaults


def _our_model(defaults):
    return Tacotron2(
        input_dim=defaults["input_dim"],
        output_dim=defaults["output_dim"],
        hidden_dim=defaults["hidden_dim"],
        dec_layers=defaults["dec_layers"],
        multi_speaker=defaults["multi_speaker"],
        spk_emb_dim=defaults["spk_emb_dim"],
        integrate_logf0=defaults["integrate_logf0"],
        prenet_dropout_rate=0.0,
        dec_dropout_rate=0.0,
    )


def test_bilstm_matches_packed_torch():
    B, T, D, H = 3, 12, 6, 8
    torch.manual_seed(0)
    ref = torch.nn.LSTM(D, H, 1, batch_first=True, bidirectional=True)
    lengths = torch.tensor([12, 9, 5])
    x = torch.randn(B, T, D)
    packed = torch.nn.utils.rnn.pack_padded_sequence(x, lengths, batch_first=True)
    with torch.no_grad():
        out, _ = ref(packed)
    want, _ = torch.nn.utils.rnn.pad_packed_sequence(out, batch_first=True)

    sd = ref.state_dict()
    p = {
        "fwd": {
            "w_ih": jnp.asarray(sd["weight_ih_l0"].numpy().T),
            "w_hh": jnp.asarray(sd["weight_hh_l0"].numpy().T),
            "b_ih": jnp.asarray(sd["bias_ih_l0"].numpy()),
            "b_hh": jnp.asarray(sd["bias_hh_l0"].numpy()),
        },
        "bwd": {
            "w_ih": jnp.asarray(sd["weight_ih_l0_reverse"].numpy().T),
            "w_hh": jnp.asarray(sd["weight_hh_l0_reverse"].numpy().T),
            "b_ih": jnp.asarray(sd["bias_ih_l0_reverse"].numpy()),
            "b_hh": jnp.asarray(sd["bias_hh_l0_reverse"].numpy()),
        },
    }
    got = bilstm(p, jnp.asarray(x.numpy()), jnp.asarray(lengths.numpy()))
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("teacher_forcing", [True, False])
def test_tacotron2_parity(teacher_forcing):
    ref, defaults = _ref_model()
    params = convert_tacotron2(ref.state_dict())
    model = _our_model(defaults)

    B, T = 2, 14
    feats = torch.randn(B, T, 256)
    lens = torch.tensor([14, 14])
    lft = torch.randn(B, T, 1)
    logf0 = torch.randn(B, T, 1)
    embs = torch.randn(B, 24, 1)
    targets = torch.randn(B, T, 63) if teacher_forcing else None

    with torch.no_grad():
        want, _ = ref(feats, lens, lft, logf0, embs, targets)

    got, _, _ = model.apply(
        params,
        jnp.asarray(feats.numpy()),
        jnp.asarray(lens.numpy()),
        jnp.asarray(lft.numpy()),
        jnp.asarray(logf0.numpy()),
        jnp.asarray(embs.numpy()[:, :, 0]),
        jnp.asarray(targets.numpy()) if targets is not None else None,
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), rtol=2e-3, atol=2e-3
    )


def test_tacotron2_ragged_lengths_parity():
    ref, defaults = _ref_model()
    params = convert_tacotron2(ref.state_dict())
    model = _our_model(defaults)

    B, T = 3, 12
    lens_np = np.array([12, 9, 6])
    feats = torch.randn(B, T, 256)
    lft = torch.randn(B, T, 1)
    logf0 = torch.randn(B, T, 1)
    embs = torch.randn(B, 24, 1)
    targets = torch.randn(B, T, 63)

    with torch.no_grad():
        want, _ = ref(feats, torch.tensor(lens_np), lft, logf0, embs, targets)

    got, _, _ = model.apply(
        params,
        jnp.asarray(feats.numpy()),
        jnp.asarray(lens_np),
        jnp.asarray(lft.numpy()),
        jnp.asarray(logf0.numpy()),
        jnp.asarray(embs.numpy()[:, :, 0]),
        jnp.asarray(targets.numpy()),
        train=False,
    )
    # compare only valid frames per sequence (padding regions differ by design)
    for b, L in enumerate(lens_np):
        np.testing.assert_allclose(
            np.asarray(got)[b, :L], want.numpy()[b, :L], rtol=2e-3, atol=2e-3,
            err_msg=f"seq {b}",
        )


def test_subfreq_discriminator_parity():
    from harana.models.tacotron2 import SubFreqDiscriminator as RefSFD

    torch.manual_seed(9)
    ref = RefSFD().eval()
    x = torch.randn(2, 50, 30)
    with torch.no_grad():
        want = ref(x)

    sd = {f"low_discriminator.{k}": v for k, v in ref.state_dict().items()}
    params = convert_subfreq_discriminator(sd)["low"]
    got = SubFreqDiscriminator().apply(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), rtol=5e-4, atol=5e-4
    )


def test_multi_subfreq_band_split_matches_unfold():
    """Our static band slicing == torch unfold(size=30, step=15) ordering."""
    x = torch.arange(63).float()[None, None, :].expand(1, 4, 63)
    unfolded = x.unfold(dimension=2, size=30, step=15).transpose(3, 2)
    x_high, x_mid, x_low = torch.split(unfolded, [1, 1, 1], dim=3)
    xj = np.asarray(x.numpy())
    np.testing.assert_array_equal(x_high.squeeze(3).numpy(), xj[:, :, 0:30])
    np.testing.assert_array_equal(x_mid.squeeze(3).numpy(), xj[:, :, 15:45])
    np.testing.assert_array_equal(x_low.squeeze(3).numpy(), xj[:, :, 30:60])
