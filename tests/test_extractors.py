"""Structural tests for the frozen extractors (HuBERT-soft, x-vector).

No pretrained checkpoints exist in this environment, so these validate
shapes, jit-ability, hop behavior, and determinism rather than weight-level
parity (the converters are exercised against synthetic state dicts shaped
like the real checkpoints).
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from svcc23_fastsvc_tpu.models.hubert import (
    HubertSoft,
    convert_hubert_state_dict,
)
from svcc23_fastsvc_tpu.models.xvector import (
    XVector,
    convert_xvector_state_dict,
    fbank_features,
    sentence_norm,
)


SMALL = dict(d_model=96, n_layers=2, n_heads=4, ff_dim=192, conv_dim=64,
             unit_dim=32)


def test_hubert_soft_shapes_and_hop():
    model = HubertSoft(**SMALL)
    params = model.init(jax.random.PRNGKey(0))
    wav = jnp.asarray(np.random.default_rng(0).standard_normal(16000), jnp.float32)
    units = model.apply(params, wav)
    # 10 ms hop at 16 kHz -> ~100 frames per second
    assert units.shape[0] == 1 and units.shape[2] == 32
    assert 95 <= units.shape[1] <= 105, units.shape

    model20 = HubertSoft(hop10ms=False, **SMALL)
    params20 = model20.init(jax.random.PRNGKey(0))
    units20 = model20.apply(params20, wav)
    assert 45 <= units20.shape[1] <= 55, units20.shape


def test_hubert_converter_roundtrip_structure():
    """Converter consumes a torch-shaped state dict and produces params the
    model can run with."""
    model = HubertSoft(**SMALL)
    D, C, H = model.d_model, model.conv_dim, model.ff_dim
    g = torch.Generator().manual_seed(0)
    sd = {}
    specs = [(10, 1)] + [(3, C)] * 4 + [(2, C)] * 2
    for i, (k, cin) in enumerate(specs):
        sd[f"feature_extractor.conv{i}.weight"] = torch.randn(C, cin, k, generator=g)
    sd["feature_extractor.norm0.weight"] = torch.ones(C)
    sd["feature_extractor.norm0.bias"] = torch.zeros(C)
    sd["feature_projection.norm.weight"] = torch.ones(C)
    sd["feature_projection.norm.bias"] = torch.zeros(C)
    sd["feature_projection.projection.weight"] = torch.randn(D, C, generator=g) * 0.02
    sd["feature_projection.projection.bias"] = torch.zeros(D)
    sd["positional_embedding.conv.weight"] = torch.randn(D, D // 16, 128, generator=g) * 0.01
    sd["positional_embedding.conv.bias"] = torch.zeros(D)
    sd["norm.weight"] = torch.ones(D)
    sd["norm.bias"] = torch.zeros(D)
    for i in range(2):
        b = f"encoder.layers.{i}"
        sd[f"{b}.self_attn.in_proj_weight"] = torch.randn(3 * D, D, generator=g) * 0.02
        sd[f"{b}.self_attn.in_proj_bias"] = torch.zeros(3 * D)
        sd[f"{b}.self_attn.out_proj.weight"] = torch.randn(D, D, generator=g) * 0.02
        sd[f"{b}.self_attn.out_proj.bias"] = torch.zeros(D)
        sd[f"{b}.linear1.weight"] = torch.randn(H, D, generator=g) * 0.02
        sd[f"{b}.linear1.bias"] = torch.zeros(H)
        sd[f"{b}.linear2.weight"] = torch.randn(D, H, generator=g) * 0.02
        sd[f"{b}.linear2.bias"] = torch.zeros(D)
        sd[f"{b}.norm1.weight"] = torch.ones(D)
        sd[f"{b}.norm1.bias"] = torch.zeros(D)
        sd[f"{b}.norm2.weight"] = torch.ones(D)
        sd[f"{b}.norm2.bias"] = torch.zeros(D)
    sd["proj.weight"] = torch.randn(model.unit_dim, D, generator=g) * 0.02
    sd["proj.bias"] = torch.zeros(model.unit_dim)

    params = convert_hubert_state_dict(sd, model)
    wav = jnp.asarray(np.random.default_rng(1).standard_normal(8000), jnp.float32)
    units = model.apply(params, wav)
    assert np.isfinite(np.asarray(units)).all()


XV_SMALL = dict(tdnn_channels=(32, 32, 32, 32, 96), emb_dim=64)


def test_xvector_shapes_and_norm():
    model = XVector(**XV_SMALL)
    params = model.init(jax.random.PRNGKey(0))
    wav = jnp.asarray(np.random.default_rng(2).standard_normal(16000), jnp.float32)
    emb = model.encode(params, wav)
    assert emb.shape == (1, 64)
    assert np.isfinite(np.asarray(emb)).all()

    # sentence norm zeroes the temporal mean
    feats = fbank_features(wav[None])
    normed = sentence_norm(feats)
    np.testing.assert_allclose(
        np.asarray(jnp.mean(normed, axis=1)), 0.0, atol=1e-4
    )


def test_xvector_converter_structure():
    g = torch.Generator().manual_seed(1)
    sd = {}
    chans = [(24, 32, 5), (32, 32, 3), (32, 32, 3), (32, 32, 1), (32, 96, 1)]
    for i, (cin, cout, k) in enumerate(chans):
        sd[f"blocks.{3*i}.conv.weight"] = torch.randn(cout, cin, k, generator=g) * 0.02
        sd[f"blocks.{3*i}.conv.bias"] = torch.zeros(cout)
        sd[f"blocks.{3*i+2}.norm.weight"] = torch.ones(cout)
        sd[f"blocks.{3*i+2}.norm.bias"] = torch.zeros(cout)
        sd[f"blocks.{3*i+2}.norm.running_mean"] = torch.zeros(cout)
        sd[f"blocks.{3*i+2}.norm.running_var"] = torch.ones(cout)
    sd["blocks.16.w.weight"] = torch.randn(64, 192, generator=g) * 0.02
    sd["blocks.16.w.bias"] = torch.zeros(64)

    params = convert_xvector_state_dict(sd)
    model = XVector(**XV_SMALL)
    wav = jnp.asarray(np.random.default_rng(3).standard_normal(12000), jnp.float32)
    emb = model.encode(params, wav)
    assert emb.shape == (1, 64) and np.isfinite(np.asarray(emb)).all()
