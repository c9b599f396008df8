"""HuBERT-soft unit extractor (B02 linguistic features), JAX.

The reference loads torch.hub "bshall/hubert:main" hubert_soft and halves
conv6's stride to get 10 ms units
(/root/reference/harana/bin/preprocess_b02.py:214-215). This is a JAX
re-implementation of that architecture (CNN feature extractor → feature
projection → conv positional embedding → 12-layer post-norm transformer →
256-d soft-unit projection) with a converter for the bshall checkpoint
format. With `hop10ms=True` the last extractor conv uses stride 1,
reproducing the reference's hop hack.

Weights are required for meaningful units (the model is a frozen extractor);
without a checkpoint the pipeline should use the logmel linguistic mode.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.conv import conv1d, linear


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def layer_norm(x, p, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["w"] + p["b"]


def group_norm(x, p, groups: int, eps=1e-5):
    """GroupNorm over (B, T, C)."""
    B, T, C = x.shape
    g = x.reshape(B, T, groups, C // groups)
    mean = jnp.mean(g, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(g - mean), axis=(1, 3), keepdims=True)
    g = (g - mean) * jax.lax.rsqrt(var + eps)
    return g.reshape(B, T, C) * p["w"] + p["b"]


@dataclass(frozen=True)
class HubertSoft:
    d_model: int = 768
    n_layers: int = 12
    n_heads: int = 12
    ff_dim: int = 3072
    conv_dim: int = 512
    unit_dim: int = 256
    hop10ms: bool = True  # conv6 stride 1 (reference hop hack)

    # extractor conv spec: (kernel, stride)
    @property
    def conv_spec(self):
        last_stride = 1 if self.hop10ms else 2
        return [(10, 5), (3, 2), (3, 2), (3, 2), (3, 2), (2, 2), (2, last_stride)]

    def init(self, key):
        D, C, H = self.d_model, self.conv_dim, self.ff_dim
        ks = iter(jax.random.split(key, 16 + 8 * self.n_layers))

        def lin(din, dout):
            return {
                "w": jax.random.normal(next(ks), (din, dout)) / math.sqrt(din),
                "b": jnp.zeros((dout,)),
            }

        convs = []
        cin = 1
        for (k, s) in self.conv_spec:
            convs.append({
                "w": jax.random.normal(next(ks), (k, cin, C)) / math.sqrt(k * cin)
            })
            cin = C
        layers = []
        for _ in range(self.n_layers):
            layers.append({
                "attn": {
                    "in_proj": lin(D, 3 * D),
                    "out_proj": lin(D, D),
                },
                "linear1": lin(D, H),
                "linear2": lin(H, D),
                "norm1": {"w": jnp.ones((D,)), "b": jnp.zeros((D,))},
                "norm2": {"w": jnp.ones((D,)), "b": jnp.zeros((D,))},
            })
        return {
            "extractor": {
                "convs": convs,
                "norm0": {"w": jnp.ones((C,)), "b": jnp.zeros((C,))},
            },
            "projection": {
                "norm": {"w": jnp.ones((C,)), "b": jnp.zeros((C,))},
                "linear": lin(C, D),
            },
            "pos_conv": {
                "w": jax.random.normal(next(ks), (128, D // 16, D)) * 0.01,
                "b": jnp.zeros((D,)),
            },
            "norm": {"w": jnp.ones((D,)), "b": jnp.zeros((D,))},
            "layers": layers,
            "proj": lin(D, self.unit_dim),
        }

    def _extract(self, p, wav):
        """(B, T) → (B, T', conv_dim)."""
        h = wav[:, :, None]
        for i, ((k, s), cp) in enumerate(zip(self.conv_spec, p["convs"])):
            h = conv1d(h, cp["w"], stride=s, padding="VALID")
            if i == 0:
                h = group_norm(h, p["norm0"], groups=self.conv_dim)
            h = _gelu(h)
        return h

    def _attention(self, p, x):
        B, T, D = x.shape
        qkv = linear(x, p["in_proj"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = D // self.n_heads

        def heads(t):
            return t.reshape(B, T, self.n_heads, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        scores = (q @ k.transpose(0, 1, 3, 2)) / math.sqrt(hd)
        attn = jax.nn.softmax(scores, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, T, D)
        return linear(out, p["out_proj"])

    def apply(self, p, wav):
        """Soft units: (B, T) or (T,) 16 kHz waveform → (B, T', 256)."""
        if wav.ndim == 1:
            wav = wav[None]
        # reference pads ((400-320)//2) both sides (bshall units())
        wav = jnp.pad(wav, ((0, 0), (40, 40)))
        h = self._extract(p["extractor"], wav)
        h = layer_norm(h, p["projection"]["norm"])
        h = linear(h, p["projection"]["linear"])

        # conv positional embedding: k=128, groups=16, same-pad, drop last
        pos = conv1d(h, p["pos_conv"]["w"], p["pos_conv"]["b"],
                     padding=64, groups=16)[:, :-1]
        h = h + _gelu(pos)
        h = layer_norm(h, p["norm"])

        for lp in p["layers"]:
            # torch post-norm TransformerEncoderLayer
            h = layer_norm(h + self._attention(lp["attn"], h), lp["norm1"])
            ff = linear(_gelu(linear(h, lp["linear1"])), lp["linear2"])
            h = layer_norm(h + ff, lp["norm2"])
        return linear(h, p["proj"])


def convert_hubert_state_dict(sd, model: HubertSoft | None = None) -> dict:
    """bshall/hubert checkpoint state dict → framework params."""
    if model is None:
        model = HubertSoft()

    def np_(x):
        if hasattr(x, "detach"):
            x = x.detach().cpu().numpy()
        return np.asarray(x)

    def lin(prefix):
        return {
            "w": jnp.asarray(np_(sd[f"{prefix}.weight"]).T),
            "b": jnp.asarray(np_(sd[f"{prefix}.bias"])),
        }

    convs = [
        {"w": jnp.asarray(
            np_(sd[f"feature_extractor.conv{i}.weight"]).transpose(2, 1, 0))}
        for i in range(7)
    ]
    layers = []
    for i in range(model.n_layers):
        b = f"encoder.layers.{i}"
        layers.append({
            "attn": {
                "in_proj": {
                    "w": jnp.asarray(np_(sd[f"{b}.self_attn.in_proj_weight"]).T),
                    "b": jnp.asarray(np_(sd[f"{b}.self_attn.in_proj_bias"])),
                },
                "out_proj": lin(f"{b}.self_attn.out_proj"),
            },
            "linear1": lin(f"{b}.linear1"),
            "linear2": lin(f"{b}.linear2"),
            "norm1": {"w": jnp.asarray(np_(sd[f"{b}.norm1.weight"])),
                      "b": jnp.asarray(np_(sd[f"{b}.norm1.bias"]))},
            "norm2": {"w": jnp.asarray(np_(sd[f"{b}.norm2.weight"])),
                      "b": jnp.asarray(np_(sd[f"{b}.norm2.bias"]))},
        })
    # positional conv stored with weight norm in the torch checkpoint
    if "encoder.pos_conv_embed.conv.weight_v" in sd:
        v = np_(sd["encoder.pos_conv_embed.conv.weight_v"])
        g = np_(sd["encoder.pos_conv_embed.conv.weight_g"])
        w = g * v / np.linalg.norm(v, axis=(1, 2), keepdims=True)
        pos_w = w
        pos_b = np_(sd["encoder.pos_conv_embed.conv.bias"])
    else:
        prefix = ("positional_embedding.conv"
                  if "positional_embedding.conv.weight_v" in sd
                  or "positional_embedding.conv.weight" in sd
                  else "encoder.pos_conv.0")
        if f"{prefix}.weight_v" in sd:
            v = np_(sd[f"{prefix}.weight_v"])
            g = np_(sd[f"{prefix}.weight_g"])
            # torch weight_norm on Conv1d dim=2 for hubert pos conv
            norm = np.linalg.norm(v, axis=(0, 1), keepdims=True)
            w = g * v / norm
        else:
            w = np_(sd[f"{prefix}.weight"])
        pos_w = w
        pos_b = np_(sd[f"{prefix}.bias"])
    return {
        "extractor": {
            "convs": convs,
            "norm0": {
                "w": jnp.asarray(np_(sd["feature_extractor.norm0.weight"])),
                "b": jnp.asarray(np_(sd["feature_extractor.norm0.bias"])),
            },
        },
        "projection": {
            "norm": {"w": jnp.asarray(np_(sd["feature_projection.norm.weight"])),
                     "b": jnp.asarray(np_(sd["feature_projection.norm.bias"]))},
            "linear": lin("feature_projection.projection"),
        },
        "pos_conv": {"w": jnp.asarray(pos_w.transpose(2, 1, 0)),
                     "b": jnp.asarray(pos_b)},
        "norm": {"w": jnp.asarray(np_(sd["norm.weight"])),
                 "b": jnp.asarray(np_(sd["norm.bias"]))},
        "layers": layers,
        "proj": lin("proj"),
    }


def load_hubert_soft(checkpoint_path: str):
    """Load a bshall hubert-soft checkpoint → callable (T,) → (T', 256)."""
    import torch

    sd = torch.load(checkpoint_path, map_location="cpu")
    if isinstance(sd, dict) and "hubert" in sd:
        sd = sd["hubert"]
    model = HubertSoft()
    params = convert_hubert_state_dict(sd, model)

    @jax.jit
    def fwd(wav):
        return model.apply(params, wav)[0]

    return fwd
