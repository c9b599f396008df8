"""Conformer PPG extractor parity vs the reference torch implementation."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from conftest import make_reference_importable
from svcc23_fastsvc_tpu.models.conformer_ppg import (
    ConformerPPG,
    convert_ppg_state_dict,
    frontend_logmel,
    utterance_mvn,
)

HAS_REF = make_reference_importable()
pytestmark = pytest.mark.skipif(not HAS_REF, reason="reference tree not present")

RNG = np.random.default_rng(11)


def _small_ref_model(num_blocks=2):
    """Reference PPGModel with a small conformer (same shapes as prod
    except depth) and random torch weights."""
    import argparse
    import yaml

    from harana.ppg.build_ppg_model import build_model

    with open(
        "/root/reference/harana/ppg/en_conformer_ctc_att/config.yaml"
    ) as f:
        args = yaml.safe_load(f)
    args = argparse.Namespace(**args)
    args.encoder_conf = dict(args.encoder_conf)
    args.encoder_conf["num_blocks"] = num_blocks
    # zero dropout for deterministic parity
    for k in ("dropout_rate", "positional_dropout_rate", "attention_dropout_rate"):
        args.encoder_conf[k] = 0.0
    torch.manual_seed(3)
    model = build_model(args)
    # randomize batchnorm running stats so eval-mode BN is nontrivial
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)
    return model.eval()


def test_frontend_logmel_parity():
    ref = _small_ref_model()
    speech = (RNG.standard_normal(16000 * 1) * 0.1).astype(np.float32)
    st = torch.from_numpy(speech)[None]
    lens = torch.LongTensor([len(speech)])
    with torch.no_grad():
        feats_ref, _ = ref._extract_feats(st, lens)
    got = frontend_logmel(jnp.asarray(speech))
    np.testing.assert_allclose(
        np.asarray(got[0]), feats_ref[0].numpy(), rtol=2e-3, atol=2e-3
    )


def test_utterance_mvn_quirk_parity():
    from harana.ppg.utterance_mvn import UtteranceMVN

    x = RNG.standard_normal((1, 50, 80)).astype(np.float32)
    mvn = UtteranceMVN(norm_means=True, norm_vars=True)
    with torch.no_grad():
        want, _ = mvn(torch.from_numpy(x.copy()), torch.LongTensor([50]))
    got = utterance_mvn(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-5)


def test_full_ppg_parity():
    ref = _small_ref_model(num_blocks=2)
    speech = (RNG.standard_normal(8000) * 0.1).astype(np.float32)
    st = torch.from_numpy(speech)[None]
    lens = torch.LongTensor([len(speech)])
    with torch.no_grad():
        want = ref(st, lens)[0].numpy()  # (T', 144)

    params = convert_ppg_state_dict(ref.encoder.state_dict(), num_blocks=2)
    model = ConformerPPG(num_blocks=2)
    got = np.asarray(model.apply(params, jnp.asarray(speech))[0])
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)
