"""End-to-end B02 recipe on synthetic data: preprocess → stats → normalize →
train (both phases) → decode → vocoder synthesis."""

import os

import numpy as np
import pytest
import yaml

SR = 24000
HOP = 160


def synth_utterance(f0_base, dur_s, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(int(dur_s * SR)) / SR
    vib = f0_base * (1 + 0.03 * np.sin(2 * np.pi * 5.5 * t))
    phase = 2 * np.pi * np.cumsum(vib) / SR
    x = sum((0.5 ** k) * np.sin((k + 1) * phase) for k in range(4))
    return (0.3 * x + 0.002 * rng.standard_normal(len(t))).astype(np.float32)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    from svcc23_fastsvc_tpu.bin.common import write_wav

    root = tmp_path_factory.mktemp("b02")
    scp_lines = []
    for spk, f0 in (("spkA", 150.0), ("spkB", 240.0)):
        for j in range(2):
            utt = f"{spk}_{j:03d}"
            path = root / f"{utt}.wav"
            write_wav(str(path), synth_utterance(f0 * (1 + 0.05 * j), 1.0, j), SR)
            scp_lines.append(f"{utt} {path}")
    (root / "wav.scp").write_text("\n".join(scp_lines) + "\n")

    cfg = {
        "sampling_rate": SR,
        "hop_size": HOP,
        "shiftms": 1000 * HOP / SR,
        "mcep_dim": 59,
        "generator_params": {
            "input_dim": 80,
            "output_dim": 60,
            "hidden_dim": 16,
            "dec_layers": 2,
            "multi_speaker": True,
            "spk_emb_dim": 32,
            "integrate_logf0": True,
            "econv_chans": 8,
            "prenet_dim": 8,
        },
        "discriminator_params": {"batch_max_frames": 20},
        "batch_size": 2,
        "discriminator_train_start_steps": 1,
        "train_max_steps": 3,
        "save_interval_steps": 3,
        "eval_interval_steps": 100,
        "log_interval_steps": 1,
        "signal_generator": {"sine_amp": 0.1, "noise_amp": 0.003,
                             "signal_types": ["sine", "noise"]},
        "aux_context_window": 2,
        "dense_factor": 4,
    }
    (root / "config.yml").write_text(yaml.safe_dump(cfg))
    return root


def test_b02_stage01_embs_preprocess(workdir):
    from svcc23_fastsvc_tpu.bin.extract_spk_embs import main as embs_main
    from svcc23_fastsvc_tpu.bin.preprocess_b02 import main as pp_main

    embs_main([
        "--wav-scp", str(workdir / "wav.scp"),
        "--out-file", str(workdir / "spk_embs.h5"),
        "--mode", "hash", "--dim", "32",
    ])
    pp_main([
        "--wav-scp", str(workdir / "wav.scp"),
        "--dumpdir", str(workdir / "dump_raw"),
        "--config", str(workdir / "config.yml"),
        "--spk-emb-file", str(workdir / "spk_embs.h5"),
        "--linguistic", "logmel",
    ])
    from svcc23_fastsvc_tpu.data.dataset import B02Dataset

    ds = B02Dataset(str(workdir / "dump_raw"))
    wave, f0, ppg, lft, lf0, vuv, mcep, bap, emb = ds[0]
    n = len(f0)
    assert mcep.shape == (n, 60) and bap.shape == (n, 3)
    assert len(ppg) == len(lft) == len(lf0) == n
    assert (np.asarray(f0) > 0).mean() > 0.5
    assert np.isfinite(mcep).all()


def test_b02_stage23_stats_normalize(workdir):
    from svcc23_fastsvc_tpu.bin.compute_statistics_b02 import compute_statistics_b02
    from svcc23_fastsvc_tpu.bin.normalize_b02 import normalize_b02

    stats = str(workdir / "stats.joblib")
    compute_statistics_b02(str(workdir / "dump_raw"), stats)
    normalize_b02(str(workdir / "dump_raw"), str(workdir / "dump_norm"), stats)
    from svcc23_fastsvc_tpu.data.dataset import B02Dataset

    ds = B02Dataset(str(workdir / "dump_norm"))
    _, _, ppg, lft, lf0, _, mcep, bap, emb = ds[0]
    assert 0.0 <= np.asarray(ppg).min() and np.asarray(ppg).max() <= 1.0 + 1e-6
    assert abs(np.asarray(mcep).mean()) < 1.0


def test_b02_stage4_train(workdir):
    from svcc23_fastsvc_tpu.bin.train_b02 import main

    main([
        "--train-dumpdir", str(workdir / "dump_norm"),
        "--outdir", str(workdir / "exp"),
        "--config", str(workdir / "config.yml"),
        "--max-frames", "60",
    ])
    from svcc23_fastsvc_tpu.train.checkpoint import latest_step

    assert latest_step(str(workdir / "exp")) == 3


def test_b02_stage5_decode(workdir):
    from svcc23_fastsvc_tpu.bin.decode_b02 import decode_b02

    f0_stats = {
        "spkA": {"lf0_mean": float(np.log(150.0)), "lf0_scale": 0.1},
        "spkB": {"lf0_mean": float(np.log(240.0)), "lf0_scale": 0.1},
    }
    decode_b02(
        str(workdir / "dump_norm"), str(workdir / "exp"),
        str(workdir / "decoded"),
        spk_emb_file=str(workdir / "spk_embs.h5"),
        f0_stats=f0_stats, speakers=["spkB"], max_frames=60,
    )
    outs = sorted(os.listdir(workdir / "decoded"))
    assert len(outs) == 4
    from svcc23_fastsvc_tpu.data.hdf5 import read_hdf5

    mcep = read_hdf5(str(workdir / "decoded" / outs[0]), "mcep")
    assert mcep.shape[1] == 60 and np.isfinite(mcep).all()

    # bf16 decode (--infer-dtype): same surface, mixed-precision forward
    decode_b02(
        str(workdir / "dump_norm"), str(workdir / "exp"),
        str(workdir / "decoded_bf16"),
        spk_emb_file=str(workdir / "spk_embs.h5"),
        f0_stats=f0_stats, speakers=["spkB"], max_frames=60,
        infer_dtype="bf16",
    )
    outs16 = sorted(os.listdir(workdir / "decoded_bf16"))
    assert outs16 == outs
    m16 = read_hdf5(str(workdir / "decoded_bf16" / outs16[0]), "mcep")
    assert np.isfinite(m16).all()
    # bf16 tracks the f32 decode to mixed-precision tolerance
    assert np.abs(m16 - mcep).mean() < 0.05 * max(np.abs(mcep).mean(), 1e-3)


def test_b02_stage7_synthesize(workdir):
    """Vocoder pass with a tiny random-weight HN-uSFGAN (no pretrained
    checkpoint in this environment)."""
    import jax
    from svcc23_fastsvc_tpu.bin.synthesize_b02 import synthesize_b02
    from svcc23_fastsvc_tpu.models.hnusfgan import HNUSFGANGenerator
    from svcc23_fastsvc_tpu.ops import fold_weight_norm

    # f0 in the decoded bundles is normalized? No: decode writes raw f0*ratio.
    voc_cfg = {
        "sampling_rate": SR,
        "hop_size": HOP,
        "signal_generator": {"sine_amp": 0.1, "noise_amp": 0.003,
                             "signal_types": ["sine", "noise"]},
        "aux_context_window": 2,
        "dense_factor": 4,
        "generator_params": {
            "harmonic_network_params": {"blockA": 2, "cycleA": 2, "blockF": 0,
                                        "cycleF": 0, "cascade_mode": 0},
            "noise_network_params": {"blockA": 0, "cycleA": 0, "blockF": 2,
                                     "cycleF": 2, "cascade_mode": 0},
            "filter_network_params": {"blockA": 0, "cycleA": 0, "blockF": 2,
                                      "cycleF": 2, "cascade_mode": 0},
            "residual_channels": 8,
            "gate_channels": 16,
            "skip_channels": 8,
            "aux_channels": 63,
            "aux_context_window": 2,
            "upsample_params": {"upsample_scales": [5, 4, 4, 2]},
        },
    }
    from svcc23_fastsvc_tpu.bin.synthesize_b02 import build_vocoder

    model = build_vocoder(voc_cfg)
    params = fold_weight_norm(model.init(jax.random.PRNGKey(0)))
    rtf = synthesize_b02(
        str(workdir / "decoded"), str(workdir / "synth"),
        config=voc_cfg, params=params,
    )
    outs = sorted(os.listdir(workdir / "synth"))
    assert len(outs) == 4 and rtf > 0
    from svcc23_fastsvc_tpu.bin.common import read_wav

    audio, sr = read_wav(str(workdir / "synth" / outs[0]))
    assert sr == SR and np.isfinite(audio).all() and len(audio) > 0
