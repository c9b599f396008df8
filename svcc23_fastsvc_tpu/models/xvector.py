"""x-vector speaker embedding extractor (TDNN), JAX.

The reference uses the frozen SpeechBrain spkrec-xvect-voxceleb
EncoderClassifier per utterance at 16 kHz, averaged per speaker
(/root/reference/harana/bin/extract_spk_embs.py:90-142). This is a JAX
re-implementation of that pipeline: 24-mel log-fbank (25 ms / 10 ms) →
sentence-level mean normalization → 5 TDNN blocks (dilated Conv1d + ReLU +
BatchNorm) → statistics pooling (mean‖std) → 512-d linear embedding, with a
converter for SpeechBrain embedding_model.ckpt state dicts.

As with HuBERT, real checkpoints are needed for meaningful embeddings; the
hash-embedding mode in extract_spk_embs covers environments without them.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.conv import conv1d, linear
from ..ops.stft import mel_filterbank, stft_magnitude


def fbank_features(wav, *, sr: int = 16000, n_mels: int = 24,
                   win: int = 400, hop: int = 160, n_fft: int = 400):
    """(B, T) → (B, F, n_mels) log-mel filterbank (SpeechBrain-style)."""
    power = stft_magnitude(
        wav, n_fft, hop, win, center=True, pad_mode="constant",
        power=True, clamp_min=0.0,
    )
    mel = power @ mel_filterbank(sr, n_fft, n_mels, dtype=power.dtype)
    return 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))


def sentence_norm(x):
    """Per-utterance mean normalization (SpeechBrain InputNormalization
    norm_type="sentence", std disabled by default)."""
    return x - jnp.mean(x, axis=1, keepdims=True)


@dataclass(frozen=True)
class XVector:
    in_dim: int = 24
    tdnn_channels: Sequence[int] = (512, 512, 512, 512, 1500)
    tdnn_kernels: Sequence[int] = (5, 3, 3, 1, 1)
    tdnn_dilations: Sequence[int] = (1, 2, 3, 1, 1)
    emb_dim: int = 512

    def init(self, key):
        ks = iter(jax.random.split(key, len(self.tdnn_channels) + 1))
        blocks = []
        cin = self.in_dim
        for c, k in zip(self.tdnn_channels, self.tdnn_kernels):
            blocks.append({
                "conv": {
                    "w": jax.random.normal(next(ks), (k, cin, c)) / math.sqrt(k * cin),
                    "b": jnp.zeros((c,)),
                },
                "bn": {"w": jnp.ones((c,)), "b": jnp.zeros((c,)),
                       "mean": jnp.zeros((c,)), "var": jnp.ones((c,))},
            })
            cin = c
        return {
            "blocks": blocks,
            "fc": {
                "w": jax.random.normal(next(ks), (2 * cin, self.emb_dim))
                / math.sqrt(2 * cin),
                "b": jnp.zeros((self.emb_dim,)),
            },
        }

    def apply(self, p, feats):
        """(B, F, in_dim) normalized fbanks → (B, emb_dim)."""
        h = feats
        for blk, k, d in zip(p["blocks"], self.tdnn_kernels, self.tdnn_dilations):
            pad = (k - 1) // 2 * d
            # SpeechBrain Conv1d default "same" padding is reflect
            if pad:
                h = jnp.pad(h, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
            h = conv1d(h, blk["conv"]["w"], blk["conv"]["b"], dilation=d)
            h = jax.nn.relu(h)
            bn = blk["bn"]
            h = (h - bn["mean"]) * jax.lax.rsqrt(bn["var"] + 1e-5) * bn["w"] + bn["b"]
        mean = jnp.mean(h, axis=1)
        std = jnp.std(h, axis=1)
        pooled = jnp.concatenate([mean, std], axis=-1)
        return linear(pooled, p["fc"])

    def encode(self, p, wav):
        """(T,) or (B, T) waveform → (B, emb_dim)."""
        if wav.ndim == 1:
            wav = wav[None]
        feats = sentence_norm(fbank_features(wav))
        return self.apply(p, feats)


def convert_xvector_state_dict(sd) -> dict:
    """SpeechBrain Xvector embedding_model state dict → params.

    SpeechBrain module tree: blocks.{3i}.conv (Conv1d), blocks.{3i+2}.norm
    (BatchNorm1d) for i in 0..4, then blocks.15 StatisticsPooling,
    blocks.16.w (Linear).
    """

    def np_(x):
        if hasattr(x, "detach"):
            x = x.detach().cpu().numpy()
        return np.asarray(x)

    blocks = []
    for i in range(5):
        conv_key = f"blocks.{3 * i}.conv.weight"
        bn_key = f"blocks.{3 * i + 2}.norm"
        blocks.append({
            "conv": {
                "w": jnp.asarray(np_(sd[conv_key]).transpose(2, 1, 0)),
                "b": jnp.asarray(np_(sd[f"blocks.{3 * i}.conv.bias"])),
            },
            "bn": {
                "w": jnp.asarray(np_(sd[f"{bn_key}.weight"])),
                "b": jnp.asarray(np_(sd[f"{bn_key}.bias"])),
                "mean": jnp.asarray(np_(sd[f"{bn_key}.running_mean"])),
                "var": jnp.asarray(np_(sd[f"{bn_key}.running_var"])),
            },
        })
    fc_w = None
    for k in ("blocks.16.w.weight", "blocks.15.w.weight", "fc.weight"):
        if k in sd:
            fc_w = k
            break
    if fc_w is None:
        raise KeyError("could not locate the embedding linear layer")
    return {
        "blocks": blocks,
        "fc": {
            "w": jnp.asarray(np_(sd[fc_w]).T),
            "b": jnp.asarray(np_(sd[fc_w.replace("weight", "bias")])),
        },
    }


def load_xvector_model(checkpoint_path: str):
    """Load a SpeechBrain embedding_model.ckpt → callable (T,) → (512,)."""
    import torch

    sd = torch.load(checkpoint_path, map_location="cpu")
    model = XVector()
    params = convert_xvector_state_dict(sd)

    @jax.jit
    def fwd(wav):
        return model.encode(params, wav)[0]

    return fwd
