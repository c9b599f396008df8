"""Frozen conformer PPG extractor (144-d phonetic posteriorgrams @ 10 ms).

JAX re-implementation of the reference's espnet-lifted PPG model
(/root/reference/harana/ppg/): STFT → log-mel80 → utterance MVN → 16-block
conformer encoder (attention_dim 144, 4 heads, macaron FFN, rel-pos
attention, conv module k15, no subsampling —
harana/ppg/en_conformer_ctc_att/config.yaml:205-225).

Inference-only (the extractor is frozen in the pipeline); the whole forward
jits into one XLA program per bucketed utterance length. Batched attention
(B=1 per utterance or padded buckets) runs as plain MXU matmuls.

Faithfully kept reference quirks (they define what the released checkpoint
expects):
  * the frontend Stft calls torch.stft WITHOUT a window argument
    (harana/ppg/stft.py:71-80) → rectangular window of win_length ones,
    zero-padded centered to n_fft;
  * UtteranceMVN with norm_means+norm_vars divides by sqrt(std) — i.e.
    var**0.25, not the std (harana/ppg/utterance_mvn.py:76-79);
  * RelPositionalEncoding uses the legacy *reversed* position table sliced
    from the front: pos_emb[t] = PE(L-1-t) with L = max(5000, T)
    (harana/ppg/encoder/embedding.py:133-166).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.conv import conv1d, conv2d, linear
from ..ops.stft import mel_filterbank, stft_magnitude


# ---------------------------------------------------------------------------
# frontend
# ---------------------------------------------------------------------------


def frontend_logmel(
    speech,
    *,
    fs: int = 16000,
    n_fft: int = 1024,
    win_length: int = 800,
    hop_length: int = 160,
    n_mels: int = 80,
):
    """(T,) or (B, T) speech → (B, T', n_mels) log-mel with the reference's
    rectangular-window STFT and librosa-0.8.1 slaney mel."""
    if speech.ndim == 1:
        speech = speech[None]
    window = jnp.ones((win_length,), speech.dtype)
    power = stft_magnitude(
        speech, n_fft, hop_length, win_length, window=window,
        center=True, pad_mode="reflect", power=True, clamp_min=0.0,
    )  # (B, T', F)
    mel = power @ mel_filterbank(fs, n_fft, n_mels, norm="slaney", dtype=power.dtype)
    return jnp.log(mel + 1e-20)


def utterance_mvn(x, *, norm_means=True, norm_vars=True, eps=1e-20):
    """(B, T, D) per-utterance normalization with the var**0.25 quirk."""
    mean = jnp.mean(x, axis=1, keepdims=True)
    if norm_means:
        x = x - mean
        if norm_vars:
            var = jnp.mean(jnp.square(x), axis=1, keepdims=True)
            std = jnp.maximum(jnp.sqrt(var), eps)
            x = x / jnp.sqrt(std)  # sic — reference divides by sqrt(std)
        return x
    if norm_vars:
        y = x - mean
        var = jnp.mean(jnp.square(y), axis=1, keepdims=True)
        std = jnp.maximum(jnp.sqrt(var), eps)
        x = x / std
    return x


# ---------------------------------------------------------------------------
# conformer pieces (pure functions over param dicts)
# ---------------------------------------------------------------------------


def layer_norm(x, p, eps=1e-12):
    # torch nn.LayerNorm default eps is 1e-5; espnet LayerNorm subclasses it
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["w"] + p["b"]


def swish(x):
    return x * jax.nn.sigmoid(x)


def rel_positional_encoding(T: int, d_model: int, dtype=jnp.float32):
    """Legacy reversed PE table sliced to T (embedding.py:45-77,133-166)."""
    L = max(5000, T)
    position = np.arange(L - 1, -1, -1.0, dtype=np.float64)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float64) * -(math.log(10000.0) / d_model)
    )
    pe = np.zeros((L, d_model))
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return jnp.asarray(pe[None, :T], dtype=dtype)


def _rel_shift(x):
    """espnet legacy rel_shift (attention.py:127-143): pad a zero column,
    reshape to roll each row left by its index."""
    b, h, t1, t2 = x.shape
    zero_pad = jnp.zeros((b, h, t1, 1), x.dtype)
    x_padded = jnp.concatenate([zero_pad, x], axis=-1)
    x_padded = x_padded.reshape(b, h, t2 + 1, t1)
    return x_padded[:, :, 1:].reshape(b, h, t1, t2)


def rel_mha(p, x, pos_emb, n_head: int, mask=None):
    """RelPositionMultiHeadedAttention forward (attention.py:146-183)."""
    B, T, D = x.shape
    d_k = D // n_head

    def heads(t):  # (B, T, D) -> (B, h, T, d_k)
        return t.reshape(B, -1, n_head, d_k).transpose(0, 2, 1, 3)

    q = heads(linear(x, p["linear_q"]))
    k = heads(linear(x, p["linear_k"]))
    v = heads(linear(x, p["linear_v"]))
    pp = heads(linear(pos_emb, p["linear_pos"]))  # (1, h, T, d_k)

    q_u = q + p["pos_bias_u"][None, :, None, :]
    q_v = q + p["pos_bias_v"][None, :, None, :]
    matrix_ac = q_u @ k.transpose(0, 1, 3, 2)
    matrix_bd = _rel_shift(q_v @ pp.transpose(0, 1, 3, 2))
    scores = (matrix_ac + matrix_bd) / math.sqrt(d_k)
    if mask is not None:
        scores = jnp.where(mask[:, None, None, :], scores, -jnp.inf)
    attn = jax.nn.softmax(scores, axis=-1)
    if mask is not None:
        attn = jnp.where(mask[:, None, None, :], attn, 0.0)
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, T, D)
    return linear(out, p["linear_out"])


def feed_forward(p, x):
    return linear(swish(linear(x, p["w_1"])), p["w_2"])


def conv_module(p, x, kernel_size: int = 15):
    """Conformer convolution module (convolution.py:13-74), BN in eval mode."""
    h = conv1d(x, p["pw1"]["w"], p["pw1"].get("b"))  # (B, T, 2C)
    a, b = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(b)  # GLU
    C = h.shape[-1]
    h = conv1d(
        h, p["dw"]["w"], p["dw"].get("b"),
        padding=(kernel_size - 1) // 2, groups=C,
    )
    bn = p["bn"]
    h = (h - bn["mean"]) * jax.lax.rsqrt(bn["var"] + 1e-5) * bn["w"] + bn["b"]
    h = swish(h)
    return conv1d(h, p["pw2"]["w"], p["pw2"].get("b"))


def encoder_layer(p, x, pos_emb, *, n_head: int, cnn_kernel: int = 15, mask=None):
    """Macaron conformer block, normalize_before=True (encoder_layer.py:77-152)."""
    # macaron FFN
    x = x + 0.5 * feed_forward(p["ff_macaron"], layer_norm(x, p["norm_ff_macaron"]))
    # MHA
    x = x + rel_mha(p["self_attn"], layer_norm(x, p["norm_mha"]), pos_emb,
                    n_head, mask)
    # conv module
    x = x + conv_module(p["conv"], layer_norm(x, p["norm_conv"]), cnn_kernel)
    # FFN
    x = x + 0.5 * feed_forward(p["ff"], layer_norm(x, p["norm_ff"]))
    return layer_norm(x, p["norm_final"])


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ConformerPPG:
    """Frontend + Conv2dNoSubsampling embed + conformer encoder stack."""

    input_size: int = 80
    attention_dim: int = 144
    attention_heads: int = 4
    linear_units: int = 576
    num_blocks: int = 16
    cnn_module_kernel: int = 15
    fs: int = 16000
    n_fft: int = 1024
    win_length: int = 800
    hop_length: int = 160

    # -- init (random weights; real use converts the torch checkpoint) -----

    def init(self, key):
        D, F, H = self.attention_dim, self.input_size, self.linear_units
        ks = iter(jax.random.split(key, 12 + 20 * self.num_blocks))

        def lin(k, din, dout, bias=True):
            p = {"w": jax.random.normal(k, (din, dout)) * (1 / math.sqrt(din))}
            if bias:
                p["b"] = jnp.zeros((dout,))
            return p

        def conv2(k, cin, cout, ksz):
            return {
                "w": jax.random.normal(k, (ksz, ksz, cin, cout))
                * (1 / math.sqrt(ksz * ksz * cin)),
                "b": jnp.zeros((cout,)),
            }

        def ln():
            return {"w": jnp.ones((D,)), "b": jnp.zeros((D,))}

        blocks = []
        for _ in range(self.num_blocks):
            blocks.append({
                "ff_macaron": {"w_1": lin(next(ks), D, H), "w_2": lin(next(ks), H, D)},
                "ff": {"w_1": lin(next(ks), D, H), "w_2": lin(next(ks), H, D)},
                "self_attn": {
                    "linear_q": lin(next(ks), D, D),
                    "linear_k": lin(next(ks), D, D),
                    "linear_v": lin(next(ks), D, D),
                    "linear_out": lin(next(ks), D, D),
                    "linear_pos": lin(next(ks), D, D, bias=False),
                    "pos_bias_u": jax.random.normal(next(ks), (self.attention_heads, D // self.attention_heads)) * 0.02,
                    "pos_bias_v": jax.random.normal(next(ks), (self.attention_heads, D // self.attention_heads)) * 0.02,
                },
                "conv": {
                    "pw1": {"w": jax.random.normal(next(ks), (1, D, 2 * D)) * (1 / math.sqrt(D)), "b": jnp.zeros((2 * D,))},
                    "dw": {"w": jax.random.normal(next(ks), (self.cnn_module_kernel, 1, D)) * 0.1, "b": jnp.zeros((D,))},
                    "bn": {"w": jnp.ones((D,)), "b": jnp.zeros((D,)),
                           "mean": jnp.zeros((D,)), "var": jnp.ones((D,))},
                    "pw2": {"w": jax.random.normal(next(ks), (1, D, D)) * (1 / math.sqrt(D)), "b": jnp.zeros((D,))},
                },
                "norm_ff_macaron": ln(), "norm_mha": ln(), "norm_conv": ln(),
                "norm_ff": ln(), "norm_final": ln(),
            })
        return {
            "embed": {
                "conv0": conv2(next(ks), 1, D, 5),
                "conv2": conv2(next(ks), D, D, 5),
                "out": lin(next(ks), D * F, D),
            },
            "blocks": blocks,
            "after_norm": {"w": jnp.ones((D,)), "b": jnp.zeros((D,))},
        }

    # -- forward -----------------------------------------------------------

    def embed_apply(self, p, feats):
        """Conv2dNoSubsampling (subsampling.py:94-134): 2x (conv5x5 + relu)
        then Linear(C*F -> D), plus rel-pos scaling."""
        B, T, F = feats.shape
        h = feats[:, :, :, None]  # NHWC: (B, T, F, 1)
        h = jax.nn.relu(conv2(h, p["conv0"], padding=2))
        h = jax.nn.relu(conv2(h, p["conv2"], padding=2))
        # torch flattens (C, F) c-major: (B, C, T, F) -> (B, T, C*F)
        h = jnp.moveaxis(h, -1, 2)  # (B, T, C, F)
        h = h.reshape(B, T, -1)
        return linear(h, p["out"])

    def encode(self, p, feats, mask=None):
        """(B, T, 80) normalized features → (B, T, attention_dim)."""
        D = self.attention_dim
        x = self.embed_apply(p["embed"], feats)
        x = x * math.sqrt(D)
        pos_emb = rel_positional_encoding(x.shape[1], D, x.dtype)
        for bp in p["blocks"]:
            x = encoder_layer(
                bp, x, pos_emb, n_head=self.attention_heads,
                cnn_kernel=self.cnn_module_kernel, mask=mask,
            )
        return layer_norm(x, p["after_norm"])

    def apply(self, p, speech, mask=None):
        """(B, T) or (T,) speech → (B, T', 144) PPG."""
        feats = frontend_logmel(
            speech, fs=self.fs, n_fft=self.n_fft,
            win_length=self.win_length, hop_length=self.hop_length,
            n_mels=self.input_size,
        )
        feats = utterance_mvn(feats)
        return self.encode(p, feats, mask)


def conv2(x, p, **kw):
    return conv2d(x, p["w"], p.get("b"), padding=kw.get("padding", 0))


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------


def convert_ppg_state_dict(sd, num_blocks: int = 16) -> dict:
    """Reference PPGModel/encoder state dict → framework params.

    Accepts either full-model keys ("encoder.encoders.0...." as produced by
    load_ppg_model) or bare encoder keys ("encoders.0....").
    """

    def np_(x):
        if hasattr(x, "detach"):
            x = x.detach().cpu().numpy()
        return np.asarray(x)

    # normalize prefix
    if any(k.startswith("encoder.") for k in sd):
        sd = {k[len("encoder."):]: v for k, v in sd.items() if k.startswith("encoder.")}

    def lin(prefix, bias=True):
        p = {"w": jnp.asarray(np_(sd[f"{prefix}.weight"]).T)}
        if bias and f"{prefix}.bias" in sd:
            p["b"] = jnp.asarray(np_(sd[f"{prefix}.bias"]))
        return p

    def conv2p(prefix):
        return {
            "w": jnp.asarray(np_(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)),
            "b": jnp.asarray(np_(sd[f"{prefix}.bias"])),
        }

    def ln(prefix):
        return {
            "w": jnp.asarray(np_(sd[f"{prefix}.weight"])),
            "b": jnp.asarray(np_(sd[f"{prefix}.bias"])),
        }

    blocks = []
    for i in range(num_blocks):
        b = f"encoders.{i}"
        blocks.append({
            "ff_macaron": {
                "w_1": lin(f"{b}.feed_forward_macaron.w_1"),
                "w_2": lin(f"{b}.feed_forward_macaron.w_2"),
            },
            "ff": {
                "w_1": lin(f"{b}.feed_forward.w_1"),
                "w_2": lin(f"{b}.feed_forward.w_2"),
            },
            "self_attn": {
                "linear_q": lin(f"{b}.self_attn.linear_q"),
                "linear_k": lin(f"{b}.self_attn.linear_k"),
                "linear_v": lin(f"{b}.self_attn.linear_v"),
                "linear_out": lin(f"{b}.self_attn.linear_out"),
                "linear_pos": lin(f"{b}.self_attn.linear_pos", bias=False),
                "pos_bias_u": jnp.asarray(np_(sd[f"{b}.self_attn.pos_bias_u"])),
                "pos_bias_v": jnp.asarray(np_(sd[f"{b}.self_attn.pos_bias_v"])),
            },
            "conv": {
                "pw1": {
                    "w": jnp.asarray(np_(sd[f"{b}.conv_module.pointwise_conv1.weight"]).transpose(2, 1, 0)),
                    "b": jnp.asarray(np_(sd[f"{b}.conv_module.pointwise_conv1.bias"])),
                },
                "dw": {
                    "w": jnp.asarray(np_(sd[f"{b}.conv_module.depthwise_conv.weight"]).transpose(2, 1, 0)),
                    "b": jnp.asarray(np_(sd[f"{b}.conv_module.depthwise_conv.bias"])),
                },
                "bn": {
                    "w": jnp.asarray(np_(sd[f"{b}.conv_module.norm.weight"])),
                    "b": jnp.asarray(np_(sd[f"{b}.conv_module.norm.bias"])),
                    "mean": jnp.asarray(np_(sd[f"{b}.conv_module.norm.running_mean"])),
                    "var": jnp.asarray(np_(sd[f"{b}.conv_module.norm.running_var"])),
                },
                "pw2": {
                    "w": jnp.asarray(np_(sd[f"{b}.conv_module.pointwise_conv2.weight"]).transpose(2, 1, 0)),
                    "b": jnp.asarray(np_(sd[f"{b}.conv_module.pointwise_conv2.bias"])),
                },
            },
            "norm_ff_macaron": ln(f"{b}.norm_ff_macaron"),
            "norm_mha": ln(f"{b}.norm_mha"),
            "norm_conv": ln(f"{b}.norm_conv"),
            "norm_ff": ln(f"{b}.norm_ff"),
            "norm_final": ln(f"{b}.norm_final"),
        })
    return {
        "embed": {
            "conv0": conv2p("embed.conv.0"),
            "conv2": conv2p("embed.conv.2"),
            "out": lin("embed.out.0"),
        },
        "blocks": blocks,
        "after_norm": ln("after_norm"),
    }


def load_ppg_model(checkpoint_path: str, *, num_blocks: int = 16):
    """Load a reference 24epoch.pth-style checkpoint and return a callable
    speech (T,) → PPG (T', 144)."""
    import torch

    sd = torch.load(checkpoint_path, map_location="cpu")
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    params = convert_ppg_state_dict(sd, num_blocks)
    model = ConformerPPG(num_blocks=num_blocks)

    @jax.jit
    def fwd(speech):
        return model.apply(params, speech)[0]

    return fwd
