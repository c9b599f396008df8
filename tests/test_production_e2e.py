"""Production-configuration end-to-end test (VERDICT.md round-1 missing #1).

The reference's real pipeline is 144-d conformer PPG + 512-d x-vector
(/root/reference/harana/bin/preprocess_fastsvc.py:79-91,171-172 and
extract_spk_embs.py:90-142), not the logmel-80/hash fallbacks the other e2e
suites default to. This suite runs the full production feature dims through
the actual CLIs with synthetic checkpoint weights in the exact on-disk
formats the converters consume:

  * conformer checkpoint: reference ConformerEncoder(num_blocks=16,
    attention_dim=144) state dict saved with torch.save — the same shapes
    and key names as 24epoch.pth's encoder subtree;
  * x-vector checkpoint: SpeechBrain embedding_model.ckpt key layout
    (blocks.{3i}.conv / blocks.{3i+2}.norm / blocks.16.w).

Covers both headline shapes: 16 kHz [2,4,4,5] (conf/fastsvc.yaml) and
24 kHz [5,4,4,2] (the paper/BASELINE metric, with the x1.5 PPG
interpolation path, preprocess_fastsvc.py:242-249).
"""

import os
import sys

import numpy as np
import pytest
import torch
import yaml

from conftest import make_reference_importable

HAS_REF = make_reference_importable()

XVEC_CHANNELS = [(24, 512, 5), (512, 512, 3), (512, 512, 3),
                 (512, 512, 1), (512, 1500, 1)]


def synth_xvector_ckpt(path):
    """SpeechBrain embedding_model.ckpt-format state dict, random weights."""
    g = torch.Generator().manual_seed(7)
    sd = {}
    for i, (cin, cout, k) in enumerate(XVEC_CHANNELS):
        sd[f"blocks.{3 * i}.conv.weight"] = (
            torch.randn(cout, cin, k, generator=g) / np.sqrt(cin * k)
        )
        sd[f"blocks.{3 * i}.conv.bias"] = torch.zeros(cout)
        sd[f"blocks.{3 * i + 2}.norm.weight"] = torch.ones(cout)
        sd[f"blocks.{3 * i + 2}.norm.bias"] = torch.zeros(cout)
        sd[f"blocks.{3 * i + 2}.norm.running_mean"] = (
            0.1 * torch.randn(cout, generator=g)
        )
        sd[f"blocks.{3 * i + 2}.norm.running_var"] = (
            1.0 + 0.1 * torch.rand(cout, generator=g)
        )
    sd["blocks.16.w.weight"] = torch.randn(512, 3000, generator=g) / np.sqrt(3000)
    sd["blocks.16.w.bias"] = torch.zeros(512)
    torch.save(sd, path)


def synth_ppg_ckpt(path, num_blocks=16):
    """Reference-format conformer encoder state dict (attention_dim 144, the
    production depth) with random torch weights."""
    from test_conformer_ppg import _small_ref_model

    model = _small_ref_model(num_blocks=num_blocks)
    torch.save(model.encoder.state_dict(), path)


def synth_utterance(f0_base, dur_s, seed, sr):
    rng = np.random.default_rng(seed)
    t = np.arange(int(dur_s * sr)) / sr
    vib = f0_base * (1 + 0.02 * np.sin(2 * np.pi * 5 * t))
    phase = 2 * np.pi * np.cumsum(vib) / sr
    x = sum((0.5 ** k) * np.sin((k + 1) * phase) for k in range(4))
    env = 0.5 * (1 - np.cos(2 * np.pi * np.minimum(t / dur_s, 1)))
    return (0.3 * x * env + 0.002 * rng.standard_normal(len(t))).astype(np.float32)


def production_config(sr):
    """conf/fastsvc.yaml production dims (in_channels 144, spk_emb 512,
    full channel stack), shrunk only in step counts/batch for test time."""
    scales = [5, 4, 4, 2] if sr == 24000 else [2, 4, 4, 5]
    return {
        "sampling_rate": sr,
        "hop_size": 160,
        "lft_hop_size": 64,
        "shiftms": 10,
        "generator_params": {
            "in_channels": 144,
            "mid_channels": [192, 96, 48, 24],
            "upsampling_scales": scales,
            "spk_emb_size": 512,
            "use_spk_emb": True,
        },
        "discriminator_params": {
            "scales": 3, "channels": 16,
            "max_downsample_channels": 512, "downsample_scales": [4, 4, 4],
        },
        "stft_loss_params": {
            "fft_sizes": [2048, 1024, 512, 256, 128, 64],
            "hop_sizes": [512, 256, 128, 64, 32, 16],
            "win_lengths": [2048, 1024, 512, 256, 128, 64],
        },
        "batch_size": 2,
        "batch_length": 4800,
        "signal_generator": {"sine_amp": 0.1, "noise_amp": 0.003,
                             "signal_types": ["sine"]},
        "discriminator_train_start_steps": 1,
        "train_max_steps": 3,
        "save_interval_steps": 3,
        "eval_interval_steps": 100,
        "log_interval_steps": 2,
        "convert_to_speakers": ["spkB"],
    }


@pytest.fixture(scope="module")
def ckpts(tmp_path_factory):
    if not HAS_REF:
        pytest.skip("reference tree not present")
    root = tmp_path_factory.mktemp("prod_ckpts")
    xvec = root / "embedding_model.ckpt"
    ppg = root / "24epoch_synth.pth"
    synth_xvector_ckpt(str(xvec))
    synth_ppg_ckpt(str(ppg))
    return {"xvector": str(xvec), "ppg": str(ppg)}


def run_pipeline(root, sr, ckpts):
    """Stages 0-5 through the real CLI mains at production feature dims."""
    from svcc23_fastsvc_tpu.bin import preprocess_fastsvc as pp
    from svcc23_fastsvc_tpu.bin.common import write_wav
    from svcc23_fastsvc_tpu.bin.compute_f0stats import compute_f0stats
    from svcc23_fastsvc_tpu.bin.compute_statistics_fastsvc import (
        compute_statistics,
    )
    from svcc23_fastsvc_tpu.bin.decode_fastsvc import decode
    from svcc23_fastsvc_tpu.bin.extract_spk_embs import main as embs_main
    from svcc23_fastsvc_tpu.bin.normalize_fastsvc import normalize
    from svcc23_fastsvc_tpu.bin.train_fastsvc import main as train_main
    from svcc23_fastsvc_tpu.data import FastSVCDataset
    from svcc23_fastsvc_tpu.data.hdf5 import read_hdf5

    wavdir = root / "wav"
    wavdir.mkdir()
    lines = []
    for spk, f0 in (("spkA", 140.0), ("spkB", 230.0)):
        for j in range(2):
            utt = f"{spk}_{j:03d}"
            path = wavdir / f"{utt}.wav"
            write_wav(str(path), synth_utterance(f0 * (1 + 0.1 * j), 1.2, j, sr), sr)
            lines.append(f"{utt} {path}")
    scp = root / "wav.scp"
    scp.write_text("\n".join(lines) + "\n")

    cfg = production_config(sr)
    cfg_path = root / "config.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    # stage 0: x-vector speaker embeddings from the synthetic SpeechBrain ckpt
    embs_main(["--wav-scp", str(scp), "--out-file", str(root / "spk_embs.h5"),
               "--mode", "xvector", "--checkpoint", ckpts["xvector"]])
    emb = read_hdf5(str(root / "spk_embs.h5"), "spkA")
    assert emb.reshape(-1).shape == (512,)

    # stage 1: conformer-PPG feature extraction
    old = sys.argv
    sys.argv = ["preprocess",
                "--wav-scp", str(scp),
                "--dumpdir", str(root / "dump_raw"),
                "--config", str(cfg_path),
                "--spk-emb-file", str(root / "spk_embs.h5"),
                "--linguistic", "conformer",
                "--ppg-checkpoint", ckpts["ppg"]]
    try:
        pp.main()
    finally:
        sys.argv = old
    ds = FastSVCDataset(str(root / "dump_raw"))
    audio, f0, ppg, lft, emb = ds[0]
    assert ppg.shape[-1] == 144
    assert emb.reshape(-1).shape == (512,)
    assert len(audio) == len(ppg) * cfg["hop_size"] == len(lft)

    # stages 2+3
    compute_f0stats(str(root / "dump_raw"), str(root / "f0_stats"))
    stats = str(root / "stats.joblib")
    compute_statistics(str(root / "dump_raw"), stats)
    normalize(str(root / "dump_raw"), str(root / "dump_norm"), stats)

    # stage 4: 3 steps crossing the GAN phase boundary
    train_main(["--train-dumpdir", str(root / "dump_norm"),
                "--outdir", str(root / "exp"),
                "--config", str(cfg_path),
                "--n-devices", "1"])
    from svcc23_fastsvc_tpu.train.checkpoint import latest_step

    assert latest_step(str(root / "exp")) == 3

    # stage 5: conversion to spkB
    rtf = decode(str(root / "dump_norm"), str(root / "exp"),
                 str(root / "decoded"),
                 f0_stats_dir=str(root / "f0_stats"),
                 spk_emb_file=str(root / "spk_embs.h5"),
                 convert_to_speakers=["spkB"])
    outs = sorted(os.listdir(root / "decoded"))
    assert len(outs) == 4
    from svcc23_fastsvc_tpu.bin.common import read_wav

    wav, got_sr = read_wav(str(root / "decoded" / outs[0]))
    assert got_sr == sr
    assert np.isfinite(wav).all()
    assert rtf > 0


@pytest.mark.skipif(not HAS_REF, reason="reference tree not present")
def test_production_pipeline_24khz(ckpts, tmp_path_factory):
    """24 kHz [5,4,4,2] — the BASELINE metric shape, PPG x1.5 interp."""
    run_pipeline(tmp_path_factory.mktemp("prod24"), 24000, ckpts)


@pytest.mark.skipif(not HAS_REF, reason="reference tree not present")
def test_production_pipeline_16khz(ckpts, tmp_path_factory):
    """16 kHz [2,4,4,5] — the conf/fastsvc.yaml recipe shape."""
    run_pipeline(tmp_path_factory.mktemp("prod16"), 16000, ckpts)
