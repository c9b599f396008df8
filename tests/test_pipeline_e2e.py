"""End-to-end recipe test on synthetic singing data.

Drives the whole 6-stage pipeline through the CLI mains (SURVEY.md §4(c)):
synthetic wavs → spk-emb extraction → feature preprocessing → stats →
normalize → f0 stats → 4 train steps (crossing the GAN phase boundary) →
decode to converted wavs.
"""

import os

import numpy as np
import pytest
import yaml

SR = 16000
HOP = 160


def synth_utterance(f0_base, dur_s, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(int(dur_s * SR)) / SR
    vib = f0_base * (1 + 0.02 * np.sin(2 * np.pi * 5 * t))
    phase = 2 * np.pi * np.cumsum(vib) / SR
    x = sum((0.5 ** k) * np.sin((k + 1) * phase) for k in range(4))
    env = 0.5 * (1 - np.cos(2 * np.pi * np.minimum(t / dur_s, 1)))
    x = 0.3 * x * env + 0.002 * rng.standard_normal(len(t))
    return x.astype(np.float32)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    from svcc23_fastsvc_tpu.bin.common import write_wav

    root = tmp_path_factory.mktemp("e2e")
    wavdir = root / "wav"
    wavdir.mkdir()
    scp_lines = []
    specs = [("spkA", 140.0), ("spkB", 230.0)]
    for spk, f0 in specs:
        for j in range(2):
            utt = f"{spk}_{j:03d}"
            path = wavdir / f"{utt}.wav"
            write_wav(str(path), synth_utterance(f0 * (1 + 0.1 * j), 1.2, j), SR)
            scp_lines.append(f"{utt} {path}")
    scp = root / "wav.scp"
    scp.write_text("\n".join(scp_lines) + "\n")

    cfg = {
        "sampling_rate": SR,
        "hop_size": HOP,
        "lft_hop_size": 64,
        "shiftms": 10,
        "generator_params": {
            "in_channels": 80,
            "mid_channels": [8, 8, 8, 8],
            "upsampling_scales": [2, 4, 4, 5],
            "spk_emb_size": 32,
            "use_spk_emb": True,
        },
        "discriminator_params": {
            "scales": 2,
            "channels": 4,
            "max_downsample_channels": 16,
            "downsample_scales": [4, 4],
        },
        "stft_loss_params": {
            "fft_sizes": [256, 128, 64],
            "hop_sizes": [64, 32, 16],
            "win_lengths": [256, 128, 64],
        },
        "batch_size": 2,
        "batch_length": 1600,
        "signal_generator": {"sine_amp": 0.1, "noise_amp": 0.003,
                             "signal_types": ["sine"]},
        "discriminator_train_start_steps": 1,
        "train_max_steps": 4,
        "save_interval_steps": 4,
        "eval_interval_steps": 100,
        "log_interval_steps": 2,
        "convert_to_speakers": ["spkB"],
    }
    cfg_path = root / "config.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    return root


def test_stage0_spk_embs(workdir):
    from svcc23_fastsvc_tpu.bin.extract_spk_embs import main

    main([
        "--wav-scp", str(workdir / "wav.scp"),
        "--out-file", str(workdir / "spk_embs.h5"),
        "--mode", "hash", "--dim", "32",
    ])
    from svcc23_fastsvc_tpu.data.hdf5 import read_hdf5

    emb = read_hdf5(str(workdir / "spk_embs.h5"), "spkA")
    assert emb.shape == (1, 32)


def test_stage1_preprocess(workdir):
    from svcc23_fastsvc_tpu.bin import preprocess_fastsvc as pp
    import sys

    argv = [
        "--wav-scp", str(workdir / "wav.scp"),
        "--dumpdir", str(workdir / "dump_raw"),
        "--config", str(workdir / "config.yml"),
        "--spk-emb-file", str(workdir / "spk_embs.h5"),
        "--linguistic", "logmel",
    ]
    old = sys.argv
    sys.argv = ["preprocess"] + argv
    try:
        pp.main()
    finally:
        sys.argv = old

    from svcc23_fastsvc_tpu.data import FastSVCDataset

    ds = FastSVCDataset(str(workdir / "dump_raw"))
    audio, f0, ppg, lft, emb = ds[0]
    assert len(audio) == len(ppg) * HOP == len(lft)
    assert ppg.shape[-1] == 80
    assert (f0 > 0).mean() > 0.5  # voiced singing


def test_stage23_stats_normalize_f0(workdir):
    from svcc23_fastsvc_tpu.bin.compute_statistics_fastsvc import compute_statistics
    from svcc23_fastsvc_tpu.bin.normalize_fastsvc import normalize
    from svcc23_fastsvc_tpu.bin.compute_f0stats import compute_f0stats

    stats_path = str(workdir / "stats.joblib")
    compute_statistics(str(workdir / "dump_raw"), stats_path)
    normalize(str(workdir / "dump_raw"), str(workdir / "dump_norm"), stats_path)
    f0stats = compute_f0stats(str(workdir / "dump_raw"), str(workdir / "f0_stats"))
    assert set(f0stats) == {"spkA", "spkB"}
    # spkB sings higher
    assert f0stats["spkB"]["f0_mean"] > f0stats["spkA"]["f0_mean"]

    # normalized ppg ~ zero-mean unit-var
    from svcc23_fastsvc_tpu.data import FastSVCDataset

    ds = FastSVCDataset(str(workdir / "dump_norm"))
    ppgs = np.concatenate([ds[i][2] for i in range(len(ds))])
    assert abs(ppgs.mean()) < 0.1
    assert abs(ppgs.std() - 1.0) < 0.15


def test_stage4_train(workdir):
    from svcc23_fastsvc_tpu.bin.train_fastsvc import main

    main([
        "--train-dumpdir", str(workdir / "dump_norm"),
        "--outdir", str(workdir / "exp"),
        "--config", str(workdir / "config.yml"),
        "--n-devices", "1",
    ])
    from svcc23_fastsvc_tpu.train.checkpoint import latest_step

    assert latest_step(str(workdir / "exp")) == 4


def test_stage5_decode(workdir):
    from svcc23_fastsvc_tpu.bin.decode_fastsvc import decode

    rtf = decode(
        str(workdir / "dump_norm"),
        str(workdir / "exp"),
        str(workdir / "decoded"),
        f0_stats_dir=str(workdir / "f0_stats"),
        spk_emb_file=str(workdir / "spk_embs.h5"),
        convert_to_speakers=["spkB"],
    )
    outs = sorted(os.listdir(workdir / "decoded"))
    assert len(outs) == 4  # 4 utterances converted to spkB
    from svcc23_fastsvc_tpu.bin.common import read_wav

    audio, sr = read_wav(str(workdir / "decoded" / outs[0]))
    assert sr == SR and len(audio) > SR  # ~1.2 s
    assert np.isfinite(audio).all()
    assert rtf > 0


def test_stage5_decode_bf16(workdir):
    """bf16 synthesis (decode --infer-dtype bf16) produces audio at the same
    scale as the f32 decode of the same checkpoint.

    The tight spectral bf16-vs-f32 bound lives at model level
    (tests/test_train_step.py::test_bf16_inference_spectral_parity) where
    PCM16 quantization and the near-silent 4-step-checkpoint output don't
    dominate the comparison.
    """
    from svcc23_fastsvc_tpu.bin.common import read_wav
    from svcc23_fastsvc_tpu.bin.decode_fastsvc import decode

    decode(
        str(workdir / "dump_norm"),
        str(workdir / "exp"),
        str(workdir / "decoded_bf16"),
        f0_stats_dir=str(workdir / "f0_stats"),
        spk_emb_file=str(workdir / "spk_embs.h5"),
        convert_to_speakers=["spkB"],
        infer_dtype="bf16",
    )
    outs = sorted(os.listdir(workdir / "decoded_bf16"))
    assert outs == sorted(os.listdir(workdir / "decoded"))
    for name in outs:
        a16, _ = read_wav(str(workdir / "decoded_bf16" / name))
        a32, _ = read_wav(str(workdir / "decoded" / name))
        assert np.isfinite(a16).all()
        assert len(a16) == len(a32)
        rms16 = float(np.sqrt(np.mean(a16**2)))
        rms32 = float(np.sqrt(np.mean(a32**2)))
        assert rms16 < 3.0 * rms32 + 1e-4 and rms32 < 3.0 * rms16 + 1e-4, (
            rms16, rms32,
        )
