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


def test_xvector_tdnn_parity_vs_torch_oracle():
    """Numerical parity of the TDNN trunk (dilated reflect-pad convs + ReLU
    + eval-mode BatchNorm + stats pooling + linear) against an independent
    torch implementation of the SpeechBrain Xvector spec, on converted
    random weights."""
    g = torch.Generator().manual_seed(4)
    chans = [(24, 32, 5, 1), (32, 32, 3, 2), (32, 32, 3, 3),
             (32, 32, 1, 1), (32, 96, 1, 1)]
    sd = {}
    for i, (cin, cout, k, _d) in enumerate(chans):
        sd[f"blocks.{3*i}.conv.weight"] = torch.randn(cout, cin, k, generator=g) * 0.2
        sd[f"blocks.{3*i}.conv.bias"] = torch.randn(cout, generator=g) * 0.1
        sd[f"blocks.{3*i+2}.norm.weight"] = 1 + 0.1 * torch.randn(cout, generator=g)
        sd[f"blocks.{3*i+2}.norm.bias"] = 0.1 * torch.randn(cout, generator=g)
        sd[f"blocks.{3*i+2}.norm.running_mean"] = 0.2 * torch.randn(cout, generator=g)
        sd[f"blocks.{3*i+2}.norm.running_var"] = 1 + 0.2 * torch.rand(cout, generator=g)
    sd["blocks.16.w.weight"] = torch.randn(64, 192, generator=g) * 0.05
    sd["blocks.16.w.bias"] = torch.randn(64, generator=g) * 0.05

    feats = np.random.default_rng(5).standard_normal((2, 50, 24)).astype(np.float32)

    # torch oracle (B, C, T) layout
    with torch.no_grad():
        h = torch.from_numpy(feats).transpose(1, 2)
        for i, (cin, cout, k, d) in enumerate(chans):
            pad = (k - 1) // 2 * d
            if pad:
                h = torch.nn.functional.pad(h, (pad, pad), mode="reflect")
            h = torch.nn.functional.conv1d(
                h, sd[f"blocks.{3*i}.conv.weight"],
                sd[f"blocks.{3*i}.conv.bias"], dilation=d,
            )
            h = torch.relu(h)
            bn = torch.nn.BatchNorm1d(cout).eval()
            bn.weight.data = sd[f"blocks.{3*i+2}.norm.weight"]
            bn.bias.data = sd[f"blocks.{3*i+2}.norm.bias"]
            bn.running_mean.data = sd[f"blocks.{3*i+2}.norm.running_mean"]
            bn.running_var.data = sd[f"blocks.{3*i+2}.norm.running_var"]
            h = bn(h)
        pooled = torch.cat([h.mean(dim=2), h.std(dim=2, unbiased=False)], dim=1)
        want = (pooled @ sd["blocks.16.w.weight"].T + sd["blocks.16.w.bias"]).numpy()

    model = XVector(tdnn_channels=(32, 32, 32, 32, 96),
                    tdnn_kernels=(5, 3, 3, 1, 1),
                    tdnn_dilations=(1, 2, 3, 1, 1), emb_dim=64)
    params = convert_xvector_state_dict(sd)
    got = np.asarray(model.apply(params, jnp.asarray(feats)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_hubert_forward_parity_vs_torch_oracle():
    """Numerical parity of the full HubertSoft forward (extractor convs +
    GroupNorm + projection + grouped pos-conv + post-norm transformer +
    unit projection) against an independent torch implementation of the
    bshall spec, on converted random weights."""
    import torch.nn.functional as tF

    model = HubertSoft(**SMALL)
    D, C, H = model.d_model, model.conv_dim, model.ff_dim
    g = torch.Generator().manual_seed(11)
    sd = {}
    specs = [(10, 1)] + [(3, C)] * 4 + [(2, C)] * 2
    for i, (k, cin) in enumerate(specs):
        sd[f"feature_extractor.conv{i}.weight"] = torch.randn(C, cin, k, generator=g) * (1.0 / np.sqrt(k * cin))
    sd["feature_extractor.norm0.weight"] = 1 + 0.1 * torch.randn(C, generator=g)
    sd["feature_extractor.norm0.bias"] = 0.1 * torch.randn(C, generator=g)
    sd["feature_projection.norm.weight"] = 1 + 0.1 * torch.randn(C, generator=g)
    sd["feature_projection.norm.bias"] = 0.1 * torch.randn(C, generator=g)
    sd["feature_projection.projection.weight"] = torch.randn(D, C, generator=g) * 0.05
    sd["feature_projection.projection.bias"] = 0.02 * torch.randn(D, generator=g)
    sd["positional_embedding.conv.weight"] = torch.randn(D, D // 16, 128, generator=g) * 0.02
    sd["positional_embedding.conv.bias"] = 0.02 * torch.randn(D, generator=g)
    sd["norm.weight"] = 1 + 0.1 * torch.randn(D, generator=g)
    sd["norm.bias"] = 0.1 * torch.randn(D, generator=g)
    for i in range(model.n_layers):
        b = f"encoder.layers.{i}"
        sd[f"{b}.self_attn.in_proj_weight"] = torch.randn(3 * D, D, generator=g) * 0.05
        sd[f"{b}.self_attn.in_proj_bias"] = 0.02 * torch.randn(3 * D, generator=g)
        sd[f"{b}.self_attn.out_proj.weight"] = torch.randn(D, D, generator=g) * 0.05
        sd[f"{b}.self_attn.out_proj.bias"] = 0.02 * torch.randn(D, generator=g)
        sd[f"{b}.linear1.weight"] = torch.randn(H, D, generator=g) * 0.05
        sd[f"{b}.linear1.bias"] = 0.02 * torch.randn(H, generator=g)
        sd[f"{b}.linear2.weight"] = torch.randn(D, H, generator=g) * 0.05
        sd[f"{b}.linear2.bias"] = 0.02 * torch.randn(D, generator=g)
        sd[f"{b}.norm1.weight"] = 1 + 0.1 * torch.randn(D, generator=g)
        sd[f"{b}.norm1.bias"] = 0.1 * torch.randn(D, generator=g)
        sd[f"{b}.norm2.weight"] = 1 + 0.1 * torch.randn(D, generator=g)
        sd[f"{b}.norm2.bias"] = 0.1 * torch.randn(D, generator=g)
    sd["proj.weight"] = torch.randn(model.unit_dim, D, generator=g) * 0.05
    sd["proj.bias"] = 0.02 * torch.randn(model.unit_dim, generator=g)

    wav = (np.random.default_rng(12).standard_normal(6400) * 0.1).astype(np.float32)

    # --- torch oracle
    with torch.no_grad():
        x = torch.from_numpy(wav)[None]
        x = tF.pad(x, (40, 40))[:, None, :]
        for i, (k, s) in enumerate(model.conv_spec):
            x = tF.conv1d(x, sd[f"feature_extractor.conv{i}.weight"], stride=s)
            if i == 0:
                x = tF.group_norm(x, C, sd["feature_extractor.norm0.weight"],
                                  sd["feature_extractor.norm0.bias"])
            x = tF.gelu(x)
        x = x.transpose(1, 2)
        x = tF.layer_norm(x, (C,), sd["feature_projection.norm.weight"],
                          sd["feature_projection.norm.bias"])
        x = x @ sd["feature_projection.projection.weight"].T + sd["feature_projection.projection.bias"]
        pos = tF.conv1d(x.transpose(1, 2), sd["positional_embedding.conv.weight"],
                        sd["positional_embedding.conv.bias"], padding=64,
                        groups=16)[:, :, :-1]
        x = x + tF.gelu(pos.transpose(1, 2))
        x = tF.layer_norm(x, (D,), sd["norm.weight"], sd["norm.bias"])
        for i in range(model.n_layers):
            b = f"encoder.layers.{i}"
            layer = torch.nn.TransformerEncoderLayer(
                D, model.n_heads, H, dropout=0.0, activation="gelu",
                batch_first=True,
            )
            layer.self_attn.in_proj_weight.data = sd[f"{b}.self_attn.in_proj_weight"]
            layer.self_attn.in_proj_bias.data = sd[f"{b}.self_attn.in_proj_bias"]
            layer.self_attn.out_proj.weight.data = sd[f"{b}.self_attn.out_proj.weight"]
            layer.self_attn.out_proj.bias.data = sd[f"{b}.self_attn.out_proj.bias"]
            layer.linear1.weight.data = sd[f"{b}.linear1.weight"]
            layer.linear1.bias.data = sd[f"{b}.linear1.bias"]
            layer.linear2.weight.data = sd[f"{b}.linear2.weight"]
            layer.linear2.bias.data = sd[f"{b}.linear2.bias"]
            layer.norm1.weight.data = sd[f"{b}.norm1.weight"]
            layer.norm1.bias.data = sd[f"{b}.norm1.bias"]
            layer.norm2.weight.data = sd[f"{b}.norm2.weight"]
            layer.norm2.bias.data = sd[f"{b}.norm2.bias"]
            x = layer.eval()(x)
        want = (x @ sd["proj.weight"].T + sd["proj.bias"]).numpy()

    params = convert_hubert_state_dict(sd, model)
    got = np.asarray(model.apply(params, jnp.asarray(wav)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
