"""Convert reference PyTorch state dicts into this framework's param pytrees.

Works on plain numpy-converted state dicts (no torch import needed here), so
it can ingest checkpoints produced by the reference trainer
(/root/reference/harana/bin/train_fastsvc.py:104-128: state_dict["model"]
["generator"|"discriminator"]).

Layout conversions:
  torch Conv1d weight (O, I, K)    -> WIO (K, I, O)
  torch Conv2d weight (O, I, H, W) -> HWIO (H, W, I, O)
  torch Linear weight (O, I)       -> (I, O)
  weight-norm pairs weight_v/weight_g -> {"v": WIO v, "g": (O,)}
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _conv1d_entry(sd, prefix):
    """Extract one torch Conv1d/Conv2d1x3 param group as a framework dict."""
    out = {}
    if f"{prefix}.weight_v" in sd:
        v = _np(sd[f"{prefix}.weight_v"])
        g = _np(sd[f"{prefix}.weight_g"])
        if v.ndim == 4:  # Conv2d with kernel (1, K): drop the H axis
            v = v[:, :, 0, :]
        out["v"] = jnp.asarray(v.transpose(2, 1, 0))
        out["g"] = jnp.asarray(g.reshape(-1))
    else:
        w = _np(sd[f"{prefix}.weight"])
        if w.ndim == 4:
            w = w[:, :, 0, :]
        out["w"] = jnp.asarray(w.transpose(2, 1, 0))
    if f"{prefix}.bias" in sd:
        out["b"] = jnp.asarray(_np(sd[f"{prefix}.bias"]))
    return out


def _conv2d_entry(sd, prefix):
    """Extract a true torch Conv2d param group as HWIO."""
    out = {}
    if f"{prefix}.weight_v" in sd:
        v = _np(sd[f"{prefix}.weight_v"])
        g = _np(sd[f"{prefix}.weight_g"])
        out["v"] = jnp.asarray(v.transpose(2, 3, 1, 0))
        out["g"] = jnp.asarray(g.reshape(-1))
    else:
        w = _np(sd[f"{prefix}.weight"])
        out["w"] = jnp.asarray(w.transpose(2, 3, 1, 0))
    if f"{prefix}.bias" in sd:
        out["b"] = jnp.asarray(_np(sd[f"{prefix}.bias"]))
    return out


def _linear_entry(sd, prefix):
    out = {"w": jnp.asarray(_np(sd[f"{prefix}.weight"]).T)}
    if f"{prefix}.bias" in sd:
        out["b"] = jnp.asarray(_np(sd[f"{prefix}.bias"]))
    return out


def convert_fastsvc_generator(sd, *, n_blocks: int | None = None) -> dict:
    """Reference FastSVCGenerator state_dict -> framework params.

    Torch module tree (reference fastsvc.py:238-303):
      upsampling_nets.{i}.{conv_first,upsample_block0.2,conv_block{1,2,3}.1,
                           residual_block.1,emb_projector}
      downsampling_{lft,sine}.{i}.{residual_block.0,downsample_block.{2,4,6}}
      film_{lft,sine}.{i}.{conv,conv_scale,conv_shift}
      conv_last
    """
    sd = {k: v for k, v in sd.items()}
    if n_blocks is None:
        n_blocks = 1 + max(
            int(k.split(".")[1]) for k in sd if k.startswith("upsampling_nets.")
        )

    up = []
    for i in range(n_blocks):
        pre = f"upsampling_nets.{i}"
        blk = {
            "conv_first": _conv1d_entry(sd, f"{pre}.conv_first"),
            "up_conv": _conv1d_entry(sd, f"{pre}.upsample_block0.2"),
            "conv1": _conv1d_entry(sd, f"{pre}.conv_block1.1"),
            "conv2": _conv1d_entry(sd, f"{pre}.conv_block2.1"),
            "conv3": _conv1d_entry(sd, f"{pre}.conv_block3.1"),
            "res_conv": _conv1d_entry(sd, f"{pre}.residual_block.1"),
        }
        if f"{pre}.emb_projector.weight" in sd:
            blk["emb_projector"] = _linear_entry(sd, f"{pre}.emb_projector")
        up.append(blk)

    def down_chain(name):
        chain = []
        for i in range(n_blocks):
            pre = f"{name}.{i}"
            chain.append(
                {
                    "res_conv": _conv1d_entry(sd, f"{pre}.residual_block.0"),
                    "conv1": _conv1d_entry(sd, f"{pre}.downsample_block.2"),
                    "conv2": _conv1d_entry(sd, f"{pre}.downsample_block.4"),
                    "conv3": _conv1d_entry(sd, f"{pre}.downsample_block.6"),
                }
            )
        return chain

    def film_chain(name):
        return [
            {
                "conv": _conv1d_entry(sd, f"{name}.{i}.conv"),
                "conv_scale": _conv1d_entry(sd, f"{name}.{i}.conv_scale"),
                "conv_shift": _conv1d_entry(sd, f"{name}.{i}.conv_shift"),
            }
            for i in range(n_blocks)
        ]

    return {
        "up": up,
        "down_lft": down_chain("downsampling_lft"),
        "down_sine": down_chain("downsampling_sine"),
        "film_lft": film_chain("film_lft"),
        "film_sine": film_chain("film_sine"),
        "conv_last": _conv1d_entry(sd, "conv_last"),
    }


def convert_melgan_msd(sd, *, scales: int = 3, n_layers: int | None = None) -> dict:
    """Reference MelGANMultiScaleDiscriminator state_dict -> params.

    Layer j<last is Sequential(pad?, Conv1d, act); the final layer is a bare
    Conv1d (reference fastsvc.py:429-483).
    """
    if n_layers is None:
        idxs = set()
        for k in sd:
            if k.startswith("discriminators.0.layers."):
                idxs.add(int(k.split(".")[3]))
        n_layers = 1 + max(idxs)

    discs = []
    for i in range(scales):
        layers = []
        for j in range(n_layers):
            base = f"discriminators.{i}.layers.{j}"
            if j == 0:
                pre = f"{base}.1"  # after ReflectionPad1d
            elif j == n_layers - 1:
                pre = base  # bare Conv1d
            else:
                pre = f"{base}.0"
            layers.append(_conv1d_entry(sd, pre))
        discs.append({"layers": layers})
    return {"discriminators": discs}


def convert_hifigan_msd_mpd(
    sd, *, scales: int = 3, periods=(2, 3, 5, 7, 11)
) -> dict:
    """Reference HiFiGANMultiScaleMultiPeriodDiscriminator -> params."""
    msd = []
    for i in range(scales):
        idxs = set()
        for k in sd:
            if k.startswith(f"msd.discriminators.{i}.layers."):
                idxs.add(int(k.split(".")[4]))
        n_seq = 1 + max(idxs)
        layers = [
            _conv1d_entry(sd, f"msd.discriminators.{i}.layers.{j}.0")
            for j in range(n_seq)
        ]
        layers.append(_conv1d_entry(sd, f"msd.discriminators.{i}.last_layer"))
        msd.append({"layers": layers})

    mpd = []
    for i, _ in enumerate(periods):
        idxs = set()
        for k in sd:
            if k.startswith(f"mpd.discriminators.{i}.convs."):
                idxs.add(int(k.split(".")[4]))
        convs = [
            _conv2d_entry(sd, f"mpd.discriminators.{i}.convs.{j}.0")
            for j in range(1 + max(idxs))
        ]
        mpd.append(
            {
                "convs": convs,
                "output_conv": _conv2d_entry(
                    sd, f"mpd.discriminators.{i}.output_conv"
                ),
            }
        )
    return {"msd": msd, "mpd": mpd}


# ---------------------------------------------------------------------------
# B02 Tacotron2 (+ sub-freq discriminators)
# ---------------------------------------------------------------------------


def _lstm_cell_entry(sd, prefix):
    """torch LSTMCell / LSTM-direction weights -> transposed cell params."""
    def g(name):
        return jnp.asarray(_np(sd[f"{prefix}.{name}"]))

    return {
        "w_ih": g("weight_ih").T,
        "w_hh": g("weight_hh").T,
        "b_ih": g("bias_ih"),
        "b_hh": g("bias_hh"),
    }


def _bn_entry(sd, prefix):
    return {
        "w": jnp.asarray(_np(sd[f"{prefix}.weight"])),
        "b": jnp.asarray(_np(sd[f"{prefix}.bias"])),
        "mean": jnp.asarray(_np(sd[f"{prefix}.running_mean"])),
        "var": jnp.asarray(_np(sd[f"{prefix}.running_var"])),
    }


def convert_tacotron2(sd, *, econv_layers: int = 3, dec_layers: int = 2,
                      prenet_layers: int = 2) -> dict:
    """Reference Tacotron2Wrapper state dict -> framework params
    (torch tree: acoustic_network.{encoder,prenet,decs,proj,...},
    reference tacotron2.py:381-483)."""
    if any(k.startswith("acoustic_network.") for k in sd):
        sd = {k[len("acoustic_network."):]: v for k, v in sd.items()}

    enc = {
        "input_layer": _linear_entry(sd, "encoder.input_layer"),
        "convs": [
            {
                "conv": _conv1d_entry(sd, f"encoder.convs.{i}.0"),
                "bn": _bn_entry(sd, f"encoder.convs.{i}.1"),
            }
            for i in range(econv_layers)
        ],
        "blstm": {
            "fwd": {
                "w_ih": jnp.asarray(_np(sd["encoder.blstm.weight_ih_l0"]).T),
                "w_hh": jnp.asarray(_np(sd["encoder.blstm.weight_hh_l0"]).T),
                "b_ih": jnp.asarray(_np(sd["encoder.blstm.bias_ih_l0"])),
                "b_hh": jnp.asarray(_np(sd["encoder.blstm.bias_hh_l0"])),
            },
            "bwd": {
                "w_ih": jnp.asarray(_np(sd["encoder.blstm.weight_ih_l0_reverse"]).T),
                "w_hh": jnp.asarray(_np(sd["encoder.blstm.weight_hh_l0_reverse"]).T),
                "b_ih": jnp.asarray(_np(sd["encoder.blstm.bias_ih_l0_reverse"])),
                "b_hh": jnp.asarray(_np(sd["encoder.blstm.bias_hh_l0_reverse"])),
            },
        },
    }
    p = {
        "encoder": enc,
        "prenet": [
            _linear_entry(sd, f"prenet.prenet.{i}.0") for i in range(prenet_layers)
        ],
        "decs": [
            {
                "cell": _lstm_cell_entry(sd, f"decs.{i}.cell"),
                "pj": _linear_entry(sd, f"decs.{i}.pj"),
            }
            for i in range(dec_layers)
        ],
        "proj": _linear_entry(sd, "proj"),
        "bap_decoder": {
            "conv0": _conv1d_entry(sd, "bap_decoder.0"),
            "conv1": _conv1d_entry(sd, "bap_decoder.3"),
            "conv2": _conv1d_entry(sd, "bap_decoder.6"),
            "conv3": _conv1d_entry(sd, "bap_decoder.9"),
            "bn": _bn_entry(sd, "bap_decoder.10"),
        },
    }
    if "logf0_film_net.conv.weight" in sd:
        p["logf0_film"] = {
            "conv": _conv1d_entry(sd, "logf0_film_net.conv"),
            "conv_scale": _conv1d_entry(sd, "logf0_film_net.conv_scale"),
            "conv_shift": _conv1d_entry(sd, "logf0_film_net.conv_shift"),
        }
        p["lft_film"] = {
            "conv": _conv1d_entry(sd, "lft_film_net.conv"),
            "conv_scale": _conv1d_entry(sd, "lft_film_net.conv_scale"),
            "conv_shift": _conv1d_entry(sd, "lft_film_net.conv_shift"),
        }
    if "spk_emb_projection.weight" in sd:
        p["spk_emb_projection"] = _linear_entry(sd, "spk_emb_projection")
    return p


def convert_subfreq_discriminator(sd) -> dict:
    """Reference MultiSubFreqDiscriminator state dict -> params."""
    out = {}
    for band in ("low", "mid", "high"):
        pre = f"{band}_discriminator.layers"
        idxs = [int(k.split(".")[2]) for k in sd if k.startswith(pre)]
        if not idxs:
            continue
        n = 1 + max(idxs)
        layers = []
        for j in range(n):
            if f"{pre}.{j}.0.weight" in sd:
                key = f"{pre}.{j}.0"
            else:
                key = f"{pre}.{j}"
            layers.append(_conv2d_entry(sd, key))
        out[band] = {"layers": layers}
    return out


# ---------------------------------------------------------------------------
# HN-uSFGAN vocoder
# ---------------------------------------------------------------------------


def convert_hnusfgan(sd, *, n_up_scales: int = 4) -> dict:
    """Reference HNUSFGANGenerator state dict -> framework params.

    Torch tree (hnusfgan.py:95-145): conv_first_{sine,noise}, upsample_net
    (conv_in + upsample.up_layers.{2k+1}), {harmonic,noise,filter}_network
    .conv_dilated.{i}, periodicity_estimator.layers.{2k}, conv_last.{1,3}.
    """

    def blocks(net):
        pre = f"{net}.conv_dilated"
        idxs = sorted({int(k.split(".")[2]) for k in sd if k.startswith(pre)})
        out = []
        for i in idxs:
            b = f"{pre}.{i}"
            if any(k.startswith(f"{b}.convC") for k in sd):  # adaptive
                out.append({
                    "convP": _conv1d_entry(sd, f"{b}.convP"),
                    "convC": _conv1d_entry(sd, f"{b}.convC"),
                    "convF": _conv1d_entry(sd, f"{b}.convF"),
                    "aux": _conv1d_entry(sd, f"{b}.conv1x1_aux"),
                    "out": _conv1d_entry(sd, f"{b}.conv1x1_out"),
                    "skip": _conv1d_entry(sd, f"{b}.conv1x1_skip"),
                })
            else:  # fixed
                out.append({
                    "conv": _conv1d_entry(sd, f"{b}.conv"),
                    "aux": _conv1d_entry(sd, f"{b}.conv1x1_aux"),
                    "out": _conv1d_entry(sd, f"{b}.conv1x1_out"),
                    "skip": _conv1d_entry(sd, f"{b}.conv1x1_skip"),
                })
        return {"blocks": out}

    per_idxs = sorted({
        int(k.split(".")[2]) for k in sd
        if k.startswith("periodicity_estimator.layers.")
    })
    return {
        "conv_first_sine": _conv1d_entry(sd, "conv_first_sine"),
        "conv_first_noise": _conv1d_entry(sd, "conv_first_noise"),
        "upsample": {
            "conv_in": _conv1d_entry(sd, "upsample_net.conv_in"),
            "up_convs": [
                _conv1d_entry(sd, f"upsample_net.upsample.up_layers.{2 * i + 1}")
                for i in range(n_up_scales)
            ],
        },
        "harmonic": blocks("harmonic_network"),
        "noise": blocks("noise_network"),
        "filter": blocks("filter_network"),
        "periodicity": {
            "layers": [
                _conv1d_entry(sd, f"periodicity_estimator.layers.{i}")
                for i in per_idxs
            ]
        },
        "last1": _conv1d_entry(sd, "conv_last.1"),
        "last2": _conv1d_entry(sd, "conv_last.3"),
    }
