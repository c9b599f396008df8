"""B02 Tacotron2-style acoustic model + sub-frequency discriminators.

JAX re-design of /root/reference/harana/models/tacotron2.py: PPG (256-d
HuBERT-soft units) → WORLD features (60 mcep ‖ 3 bap). Conv+BLSTM encoder,
FiLM fusion of log-F0/loudness, x-vector concat+projection, autoregressive
LSTM-with-projection decoder (teacher forcing when targets given), and a
separate dilated-conv "bap" stream.

TPU-first mechanics:
  * the autoregressive decoder is a single lax.scan over time (teacher-forced
    and free-running share the same scan body via a select on the fed-back
    frame), so training and inference are each one XLA program;
  * the packed-sequence BLSTM is replaced by a length-masked scan: the
    backward direction flips each sequence within its own valid length, so
    outputs match torch's pack_padded_sequence semantics exactly;
  * batch-norm keeps torch semantics: batch statistics in train mode (with
    running-stat updates returned as aux state), stored running stats in
    eval mode.

Faithfully kept reference quirks:
  * InstanceNorm2d applied to 3-D tensors falls into torch's "unbatched"
    path and normalizes each batch element globally over (T, D)
    (tacotron2.py:468-469,524-525) — replicated as per-element global norm;
  * the bap_decoder's third conv has kernel 1 with padding 1, lengthening
    the stream by 2 frames, later narrowed back (tacotron2.py:478,574-576);
  * use_postnet constructs a postnet that forward never calls
    (tacotron2.py:449-454) — parameters exist for checkpoint parity only.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
import jax
import jax.numpy as jnp

from ..ops.conv import conv1d, conv2d, l2_normalize, leaky_relu, linear
from .fastsvc import FiLMBlock


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def lstm_cell(p, x, h, c):
    """torch LSTMCell math; weights stored transposed ((in,4H)/(H,4H))."""
    gx = x @ p["w_ih"] + p["b_ih"]
    return lstm_cell_from_gates(p, gx, h, c)


def lstm_cell_from_gates(p, gx, h, c):
    """LSTM cell given the precomputed input projection gx = x@w_ih + b_ih.

    The hoisted form: when the whole input sequence is known up front
    (encoder inputs, teacher-forced decoder inputs), x@w_ih for ALL
    timesteps is ONE (B*T, 4H) MXU matmul outside the scan, and only the
    sequentially-dependent h@w_hh recurrence stays inside. Same add
    association as the reference's x@w_ih + b_ih + h@w_hh + b_hh."""
    gates = gx + h @ p["w_hh"] + p["b_hh"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def _lstm_scan(p, xs, mask=None, unroll: int = 1):
    """Unidirectional LSTM over (B, T, D); mask (B, T) freezes state past
    each length; returns (B, T, H). The input projection runs hoisted as
    one full-sequence matmul (see lstm_cell_from_gates)."""
    B = xs.shape[0]
    H = p["w_hh"].shape[0]
    h0 = jnp.zeros((B, H), xs.dtype)
    c0 = jnp.zeros((B, H), xs.dtype)
    gx = xs @ p["w_ih"] + p["b_ih"]  # (B, T, 4H), one MXU pass

    def step(carry, inp):
        h, c = carry
        if mask is not None:
            gx_t, m_t = inp
        else:
            gx_t, m_t = inp, None
        h_new, c_new = lstm_cell_from_gates(p, gx_t, h, c)
        if m_t is not None:
            m = m_t[:, None]
            h_new = jnp.where(m, h_new, h)
            c_new = jnp.where(m, c_new, c)
            out = jnp.where(m, h_new, 0.0)
        else:
            out = h_new
        return (h_new, c_new), out

    gx_t = jnp.swapaxes(gx, 0, 1)  # (T, B, 4H)
    inputs = (gx_t, jnp.swapaxes(mask, 0, 1)) if mask is not None else gx_t
    _, outs = jax.lax.scan(step, (h0, c0), inputs, unroll=unroll)
    return jnp.swapaxes(outs, 0, 1)


def _flip_within_lengths(x, lengths):
    """Reverse each (B, T, D) sequence within its own valid length."""
    B, T, _ = x.shape
    t = jnp.arange(T)[None, :]
    idx = jnp.where(t < lengths[:, None], lengths[:, None] - 1 - t, t)
    return jnp.take_along_axis(x, idx[:, :, None], axis=1)


def bilstm(p, xs, lengths=None):
    """Bidirectional LSTM matching torch packed-sequence semantics.

    p: {"fwd": cell params, "bwd": cell params}. Output (B, T, 2H), zeros
    beyond each sequence's length.
    """
    if lengths is None:
        fwd = _lstm_scan(p["fwd"], xs)
        bwd = jnp.flip(_lstm_scan(p["bwd"], jnp.flip(xs, axis=1)), axis=1)
        return jnp.concatenate([fwd, bwd], axis=-1)
    mask = jnp.arange(xs.shape[1])[None, :] < lengths[:, None]
    fwd = _lstm_scan(p["fwd"], xs, mask)
    xs_rev = _flip_within_lengths(xs, lengths)
    bwd_rev = _lstm_scan(p["bwd"], xs_rev, mask)
    bwd = _flip_within_lengths(bwd_rev, lengths)
    return jnp.concatenate([fwd, bwd], axis=-1)


def _dropout_batched(key, x, rate: float):
    """One dropout draw over a whole (B, T, D) tensor (the hoisted prenet
    path); statistically identical to per-step draws, different stream."""
    if rate <= 0.0 or key is None:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def batch_norm(x, p, *, train: bool, momentum: float = 0.1, eps: float = 1e-5,
               axis=(0, 1)):
    """BatchNorm over (B, T, C); returns (y, new_stats). Statistics run in
    f32 (bf16 mixed-precision keeps norms exact); y returns in x's dtype
    so a bf16 stream stays bf16."""
    x32 = x.astype(jnp.float32)
    if train:
        mean = jnp.mean(x32, axis=axis)
        var = jnp.mean(jnp.square(x32 - mean), axis=axis)
        n = x.shape[0] * x.shape[1] if len(axis) == 2 else x.shape[0]
        unbiased = var * n / max(n - 1, 1)
        new_stats = {
            "mean": (1 - momentum) * p["mean"].astype(jnp.float32) + momentum * mean,
            "var": (1 - momentum) * p["var"].astype(jnp.float32) + momentum * unbiased,
        }
    else:
        mean, var = p["mean"].astype(jnp.float32), p["var"].astype(jnp.float32)
        new_stats = {"mean": p["mean"], "var": p["var"]}
    y = (x32 - mean) * jax.lax.rsqrt(var + eps) * p["w"].astype(jnp.float32) \
        + p["b"].astype(jnp.float32)
    return y.astype(x.dtype), new_stats


def instance_norm_global(x, eps: float = 1e-5):
    """torch InstanceNorm2d-on-3D quirk: per batch element, normalize over
    ALL remaining axes. f32 statistics, output in x's dtype."""
    x32 = x.astype(jnp.float32)
    axes = tuple(range(1, x.ndim))
    mean = jnp.mean(x32, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=axes, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def dropout(key, x, rate: float, *, train: bool):
    if not train or rate <= 0.0 or key is None:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


# ---------------------------------------------------------------------------
# Tacotron2
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Tacotron2:
    """Acoustic model (reference tacotron2.py:381-580)."""

    input_dim: int = 256
    output_dim: int = 60
    hidden_dim: int = 1024
    enc_layers: int = 1
    dec_layers: int = 2
    dec_dropout_rate: float = 0.2
    dec_layernorm: bool = False
    # reference Taco2Encoder hardcodes dropout_rate=0.5 (tacotron2.py:48);
    # configurable here so deterministic comparisons can disable it
    enc_dropout_rate: float = 0.5
    prenet_layers: int = 2
    prenet_dim: int = 256
    prenet_dropout_rate: float = 0.5
    multi_speaker: bool = True
    spk_emb_dim: int = 512
    integrate_logf0: bool = True
    use_postnet: bool = True
    ar_mode: bool = True
    econv_layers: int = 3
    econv_chans: int = 512
    econv_filts: int = 5
    bap_dim_in: int = 0  # 0 -> input_dim + 2 (reference hardcodes 258)
    bap_out: int = 3

    # ------------------------------------------------------------------

    def init(self, key):
        D, H = self.input_dim, self.hidden_dim
        C = self.econv_chans
        ks = iter(jax.random.split(key, 64))

        def lin(k, din, dout, bias=True):
            bound = 1 / math.sqrt(din)
            p = {"w": jax.random.uniform(k, (din, dout), minval=-bound, maxval=bound)}
            if bias:
                p["b"] = jnp.zeros((dout,))
            return p

        def cell(k, din, dh):
            k1, k2 = jax.random.split(k)
            bound = 1 / math.sqrt(dh)
            return {
                "w_ih": jax.random.uniform(k1, (din, 4 * dh), minval=-bound, maxval=bound),
                "w_hh": jax.random.uniform(k2, (dh, 4 * dh), minval=-bound, maxval=bound),
                "b_ih": jnp.zeros((4 * dh,)),
                "b_hh": jnp.zeros((4 * dh,)),
            }

        def convp(k, cin, cout, ksz, bias=False):
            p = {"w": jax.random.normal(k, (ksz, cin, cout)) * math.sqrt(2.0 / (ksz * cin))}
            if bias:
                p["b"] = jnp.zeros((cout,))
            return p

        def bn(c):
            return {"w": jnp.ones((c,)), "b": jnp.zeros((c,)),
                    "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}

        enc = {
            "input_layer": lin(next(ks), D, C),
            "convs": [
                {"conv": convp(next(ks), C, C, self.econv_filts), "bn": bn(C)}
                for _ in range(self.econv_layers)
            ],
            "blstm": {
                "fwd": cell(next(ks), C, H // 2),
                "bwd": cell(next(ks), C, H // 2),
            },
        }
        prenet = [
            lin(next(ks), self.output_dim if i == 0 else self.prenet_dim, self.prenet_dim)
            for i in range(self.prenet_layers)
        ]
        decs = []
        prev_dim = self.output_dim if self.prenet_layers == 0 else self.prenet_dim
        for i in range(self.dec_layers):
            din = H + prev_dim if i == 0 else H
            decs.append({"cell": cell(next(ks), din, H), "pj": lin(next(ks), H, H)})

        bd = self.bap_dim_in or (self.input_dim + 2)
        # reference channel schedule 258 -> 86 -> 43 -> 21 -> 3; generalized
        # so the final stream is always bap_out wide
        c1, c2, c3 = max(bd // 3, 1), max(bd // 6, 1), max(bd // 12, 1)
        bap = {
            "conv0": convp(next(ks), bd, c1, 3, bias=True),
            "conv1": convp(next(ks), c1, c2, 3, bias=True),
            "conv2": convp(next(ks), c2, c3, 1, bias=True),
            "conv3": convp(next(ks), c3, self.bap_out, 3, bias=True),
            "bn": bn(self.bap_out),
        }
        p = {
            "encoder": enc,
            "prenet": prenet,
            "decs": decs,
            "proj": lin(next(ks), H, self.output_dim),
            "bap_decoder": bap,
        }
        if self.integrate_logf0:
            film = FiLMBlock(1, use_weight_norm=False)
            p["logf0_film"] = film.init(next(ks))
            p["lft_film"] = film.init(next(ks))
        if self.multi_speaker:
            p["spk_emb_projection"] = lin(next(ks), H + self.spk_emb_dim, H)
        return p

    # ------------------------------------------------------------------

    def _encoder(self, p, xs, lengths, *, train, key):
        h = linear(xs, p["input_layer"])
        new_bns = []
        for i, cp in enumerate(p["convs"]):
            h = conv1d(h, cp["conv"]["w"], padding=(self.econv_filts - 1) // 2)
            h, bn_new = batch_norm(h, cp["bn"], train=train)
            new_bns.append(bn_new)
            h = jax.nn.relu(h)
            if train and key is not None:
                key, sub = jax.random.split(key)
                h = dropout(sub, h, self.enc_dropout_rate, train=train)
        out = bilstm(p["blstm"], h, lengths)
        return out, new_bns

    def _prenet(self, p, x, key):
        # dropout ALWAYS on (reference Taco2Prenet, tacotron2.py:142-172)
        for lp in p:
            x = jax.nn.relu(linear(x, lp))
            if key is not None:
                key, sub = jax.random.split(key)
                x = dropout(sub, x, self.prenet_dropout_rate, train=True)
        return x

    def _bap(self, p, feats, logf0, lft, *, train):
        x = jnp.concatenate([feats, logf0, lft], axis=-1)
        x = conv1d(x, p["conv0"]["w"], p["conv0"].get("b"), padding=2, dilation=2)
        x = leaky_relu(x)
        x = conv1d(x, p["conv1"]["w"], p["conv1"].get("b"), padding=2, dilation=2)
        x = leaky_relu(x)
        x = conv1d(x, p["conv2"]["w"], p["conv2"].get("b"), padding=1)  # T+2 quirk
        x = leaky_relu(x)
        x = conv1d(x, p["conv3"]["w"], p["conv3"].get("b"), padding=2, dilation=2)
        x, bn_new = batch_norm(x, p["bn"], train=train)
        return x, bn_new

    def apply(self, p, features, lengths, lft, logf0, spk_embs=None,
              targets=None, *, train: bool = False, key=None):
        """Forward (reference tacotron2.py:506-580).

        Args:
            features: (B, T, input_dim) PPG.
            lengths: (B,) valid frame counts or None.
            lft, logf0: (B, T, 1) frame-rate conditioners.
            spk_embs: (B, 1, spk_emb_dim) or (B, spk_emb_dim).
            targets: (B, T, 63) mcep‖bap for teacher forcing, or None.
        Returns:
            (predicted (B, T', output_dim + bap_out), lengths, bn_state)
        """
        B, T, _ = features.shape
        if key is None:
            key = jax.random.PRNGKey(0)
        k_enc, k_pre, k_dec = jax.random.split(key, 3)

        tf_targets = None
        if targets is not None:
            tf_targets = targets[..., : self.output_dim]

        enc, enc_bns = self._encoder(p["encoder"], features, lengths,
                                     train=train, key=k_enc)
        bap_out, bap_bn = self._bap(p["bap_decoder"], features, logf0, lft,
                                    train=train)
        bap_out = instance_norm_global(bap_out)
        enc = instance_norm_global(enc)

        if self.integrate_logf0:
            film = FiLMBlock(1, use_weight_norm=False)
            f0_scale, f0_shift = film.apply(p["logf0_film"], logf0)
            l_scale, l_shift = film.apply(p["lft_film"], lft)
            enc = (f0_scale + l_scale) * enc + (f0_shift + l_shift)

        if self.multi_speaker and spk_embs is not None:
            if spk_embs.ndim == 2:
                spk_embs = spk_embs[:, None, :]
            se = l2_normalize(spk_embs, axis=-1)
            se = jnp.broadcast_to(se, (B, enc.shape[1], se.shape[-1]))
            enc = linear(jnp.concatenate([enc, se], axis=-1),
                         p["spk_emb_projection"])

        # Autoregressive decoder as one scan over time, with every
        # time-parallel matmul hoisted OUT of the scan (TPU-first: the
        # sequential body is latency-bound — each hoisted matmul instead
        # runs as one (B*T)-row MXU pass):
        #   * teacher forcing: the fed-back frames are the (known) targets,
        #     so the prenet AND cell-0's full input projection hoist;
        #   * free-running: the encoder half of cell-0's input projection
        #     hoists (x@W splits additively across the concat axis); the
        #     prenet of the fed-back prediction stays inside;
        #   * the output projection runs on the stacked scan outputs.
        H = self.hidden_dim
        n_dec = len(p["decs"])
        dt = enc.dtype  # bf16 mixed precision keeps the scan carry bf16
        z0 = [jnp.zeros((B, H), dt) for _ in range(n_dec)]
        c0 = [jnp.zeros((B, H), dt) for _ in range(n_dec)]
        prev0 = jnp.zeros((B, self.output_dim), dt)

        dec_keys = jax.random.split(k_dec, T)
        cell0 = p["decs"][0]["cell"]

        def tail_cells(z_list, c_list, h0_new, c0_new, kd):
            """Cells 1..n (inputs are sequential) + per-cell dropout/proj."""
            new_z, new_c = list(z_list), list(c_list)
            h, c = h0_new, c0_new
            if train and self.dec_dropout_rate > 0:
                kd, sub = jax.random.split(kd)
                h = dropout(sub, h, self.dec_dropout_rate, train=True)
            h = jnp.tanh(linear(h, p["decs"][0]["pj"]))
            new_z[0], new_c[0] = h, c
            for i, dp in enumerate(p["decs"][1:], start=1):
                h, c = lstm_cell(dp["cell"], new_z[i - 1], z_list[i], c_list[i])
                if train and self.dec_dropout_rate > 0:
                    kd, sub = jax.random.split(kd)
                    h = dropout(sub, h, self.dec_dropout_rate, train=True)
                h = jnp.tanh(linear(h, dp["pj"]))
                new_z[i], new_c[i] = h, c
            return new_z, new_c

        if tf_targets is not None:
            # fed-back sequence is known: [0, tgt_0, ..., tgt_{T-2}]
            prev_seq = jnp.concatenate(
                [prev0[:, None, :], tf_targets[:, :-1, :]], axis=1
            )
            pre = prev_seq
            for li, lp in enumerate(p["prenet"]):
                k_pre, sub = jax.random.split(k_pre)
                pre = _dropout_batched(
                    sub, jax.nn.relu(linear(pre, lp)),
                    self.prenet_dropout_rate,
                )
            gx0 = jnp.concatenate([enc, pre], axis=-1) @ cell0["w_ih"] \
                + cell0["b_ih"]  # (B, T, 4H) hoisted

            def step_tf(carry, inp):
                z_list, c_list = carry
                gx0_t, kd = inp
                h, c = lstm_cell_from_gates(cell0, gx0_t, z_list[0], c_list[0])
                new_z, new_c = tail_cells(z_list, c_list, h, c, kd)
                return (tuple(new_z), tuple(new_c)), new_z[-1]

            _, z_last = jax.lax.scan(
                step_tf, (tuple(z0), tuple(c0)),
                (jnp.swapaxes(gx0, 0, 1), dec_keys),
            )
        else:
            Hc = enc.shape[-1]
            gx0_enc = enc @ cell0["w_ih"][:Hc] + cell0["b_ih"]  # hoisted half
            w_ih_pre = cell0["w_ih"][Hc:]
            pre_keys = jax.random.split(k_pre, T)

            def step_free(carry, inp):
                z_list, c_list, prev_out = carry
                gx0e_t, kd, kp = inp
                pre_t = self._prenet(p["prenet"], prev_out, kp)
                gx0_t = gx0e_t + pre_t @ w_ih_pre
                h, c = lstm_cell_from_gates(cell0, gx0_t, z_list[0], c_list[0])
                new_z, new_c = tail_cells(z_list, c_list, h, c, kd)
                pred_t = linear(new_z[-1], p["proj"])
                return (tuple(new_z), tuple(new_c), pred_t), new_z[-1]

            _, z_last = jax.lax.scan(
                step_free, (tuple(z0), tuple(c0), prev0),
                (jnp.swapaxes(gx0_enc, 0, 1), dec_keys, pre_keys),
            )

        # output projection hoisted onto the stacked scan outputs
        preds = linear(z_last, p["proj"])
        predicted = jnp.swapaxes(preds, 0, 1)  # (B, T, output_dim)

        Tmin = min(predicted.shape[1], bap_out.shape[1])
        predicted = jnp.concatenate(
            [predicted[:, :Tmin], bap_out[:, :Tmin]], axis=-1
        )
        bn_state = {"encoder": enc_bns, "bap": bap_bn}
        return predicted, lengths, bn_state


# ---------------------------------------------------------------------------
# sub-frequency discriminators
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SubFreqDiscriminator:
    """4-layer Conv2d stack over a (B, T, D') feature band
    (reference tacotron2.py:628-673)."""

    in_channels: int = 1
    layers: int = 4
    kernel_size: int = 9
    channels: int = 64

    def init(self, key):
        ks = jax.random.split(key, self.layers + 1)
        ps = []
        cin = self.in_channels
        for i in range(self.layers):
            fan = self.kernel_size * self.kernel_size * cin
            ps.append({
                "w": jax.random.uniform(
                    ks[i], (self.kernel_size, self.kernel_size, cin, self.channels),
                    minval=-1 / math.sqrt(fan), maxval=1 / math.sqrt(fan),
                )
            })
            cin = self.channels
        ps.append({
            "w": jax.random.uniform(
                ks[-1], (1, 1, cin, 1),
                minval=-1 / math.sqrt(cin), maxval=1 / math.sqrt(cin),
            ),
            "b": jnp.zeros((1,)),
        })
        return {"layers": ps}

    def apply(self, p, x):
        """x: (B, T, D') → (B, T', D'') logits map."""
        h = x[:, :, :, None]  # NHWC, C=1
        for lp in p["layers"][:-1]:
            h = conv2d(h, lp["w"], padding=4)
            h = leaky_relu(h)
        h = conv2d(h, p["layers"][-1]["w"], p["layers"][-1].get("b"))
        return h[:, :, :, 0]


@dataclass(frozen=True)
class MultiSubFreqDiscriminator:
    """3-band discriminator over random 50-frame windows
    (reference tacotron2.py:676-745).

    TPU-native: the random window slice is a static-shape
    take_along_axis gather driven by a PRNG key (the reference unpacks a
    PackedSequence in Python per batch element); the freq unfold
    (size 30, step 15 → 3 overlapping bands) is static slicing.
    """

    batch_max_frames: int = 50
    unfold_size: int = 30
    unfold_step: int = 15

    def init(self, key):
        sub = SubFreqDiscriminator()
        k1, k2, k3 = jax.random.split(key, 3)
        return {"low": sub.init(k1), "mid": sub.init(k2), "high": sub.init(k3)}

    @classmethod
    def from_config(cls, params: dict) -> "MultiSubFreqDiscriminator":
        return cls(batch_max_frames=params.get("batch_max_frames", 50))

    def slice_windows(self, x, lengths, key):
        """Random batch_max_frames window within each valid length."""
        B, T, D = x.shape
        F = self.batch_max_frames
        max_start = jnp.maximum(lengths - F, 1)
        u = jax.random.uniform(key, (B,))
        starts = (u * max_start).astype(jnp.int32)
        idx = starts[:, None] + jnp.arange(F)[None, :]
        idx = jnp.minimum(idx, T - 1)
        return jnp.take_along_axis(x, idx[:, :, None], axis=1)

    def apply(self, p, x, lengths, key=None):
        """x: (B, T, D=63+) → list of 3 per-band logit maps."""
        if key is None:
            key = jax.random.PRNGKey(0)
        x = self.slice_windows(x, lengths, key)
        s, z = self.unfold_step, self.unfold_size
        # unfold dim=2 (D): bands at offsets 0, 15, 30 — order matches the
        # reference split naming [high, mid, low] along the last unfold axis
        x_high = x[:, :, 0:z]
        x_mid = x[:, :, s : s + z]
        x_low = x[:, :, 2 * s : 2 * s + z]
        sub = SubFreqDiscriminator()
        return [
            sub.apply(p["low"], x_low),
            sub.apply(p["mid"], x_mid),
            sub.apply(p["high"], x_high),
        ]
