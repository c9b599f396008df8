"""CLI-level multi-host training: two real processes launch the
train_fastsvc CLI with --n-procs/--proc-id/--coordinator, coordinate via
jax.distributed over localhost, feed host-local batch shards, and process 0
writes the checkpoint (VERDICT.md round-1 item 2: multi-host wired into the
product CLIs, not just the library)."""

import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The session sitecustomize re-forces JAX_PLATFORMS=axon at interpreter
# start, so subprocesses must pin the CPU backend via jax.config before the
# CLI main runs — the argv path below is otherwise exactly the console
# script's.
LAUNCH = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from svcc23_fastsvc_tpu.bin.train_fastsvc import main
main(sys.argv[1:])
"""


@pytest.fixture(scope="module")
def dump_norm(tmp_path_factory):
    """Tiny normalized feature dump built through the real stage CLIs."""
    from svcc23_fastsvc_tpu.bin.common import write_wav
    from svcc23_fastsvc_tpu.bin import preprocess_fastsvc as pp
    from svcc23_fastsvc_tpu.bin.compute_statistics_fastsvc import (
        compute_statistics,
    )
    from svcc23_fastsvc_tpu.bin.extract_spk_embs import main as embs_main
    from svcc23_fastsvc_tpu.bin.normalize_fastsvc import normalize

    sr, hop = 16000, 160
    root = tmp_path_factory.mktemp("mh_cli")
    wavdir = root / "wav"
    wavdir.mkdir()
    rng = np.random.default_rng(0)
    lines = []
    for spk, f0 in (("spkA", 150.0), ("spkB", 240.0)):
        for j in range(2):
            t = np.arange(int(1.1 * sr)) / sr
            x = 0.3 * np.sin(2 * np.pi * f0 * t) + 0.002 * rng.standard_normal(len(t))
            path = wavdir / f"{spk}_{j:03d}.wav"
            write_wav(str(path), x.astype(np.float32), sr)
            lines.append(f"{spk}_{j:03d} {path}")
    (root / "wav.scp").write_text("\n".join(lines) + "\n")

    cfg = {
        "sampling_rate": sr,
        "hop_size": hop,
        "lft_hop_size": 64,
        "shiftms": 10,
        "generator_params": {
            "in_channels": 80,
            "mid_channels": [8, 8],
            "upsampling_scales": [8, 20],
            "spk_emb_size": 16,
            "use_spk_emb": True,
        },
        "discriminator_params": {
            "scales": 2, "channels": 4,
            "max_downsample_channels": 16, "downsample_scales": [4, 4],
        },
        "stft_loss_params": {
            "fft_sizes": [256, 64], "hop_sizes": [64, 16],
            "win_lengths": [256, 64],
        },
        "batch_size": 2,  # global; each of the 2 hosts feeds 1 row
        "batch_length": 1600,
        "signal_generator": {"sine_amp": 0.1, "noise_amp": 0.0,
                             "signal_types": ["sine"]},
        "discriminator_train_start_steps": 1,
        "generator_train_start_steps": 0,
        "train_max_steps": 4,
        "save_interval_steps": 4,
        "eval_interval_steps": 100,
        "log_interval_steps": 2,
        "steps_per_call": 2,  # exercises global_stacked_batch under DP
    }
    (root / "config.yml").write_text(yaml.safe_dump(cfg))

    embs_main(["--wav-scp", str(root / "wav.scp"),
               "--out-file", str(root / "spk_embs.h5"),
               "--mode", "hash", "--dim", "16"])
    old = sys.argv
    sys.argv = ["preprocess",
                "--wav-scp", str(root / "wav.scp"),
                "--dumpdir", str(root / "dump_raw"),
                "--config", str(root / "config.yml"),
                "--spk-emb-file", str(root / "spk_embs.h5"),
                "--linguistic", "logmel"]
    try:
        pp.main()
    finally:
        sys.argv = old
    stats = str(root / "stats.joblib")
    compute_statistics(str(root / "dump_raw"), stats)
    normalize(str(root / "dump_raw"), str(root / "dump_norm"), stats)
    return root


@pytest.mark.skipif(
    os.environ.get("SVC_SKIP_MULTIHOST") == "1", reason="disabled"
)
def test_two_process_cli_training(dump_norm, tmp_path):
    launcher = tmp_path / "launch.py"
    launcher.write_text(LAUNCH)
    outdir = tmp_path / "exp"
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # one CPU device per process
    args = [
        "--train-dumpdir", str(dump_norm / "dump_norm"),
        "--outdir", str(outdir),
        "--config", str(dump_norm / "config.yml"),
        "--coordinator", "127.0.0.1:29531",
        "--n-procs", "2",
    ]
    procs = [
        subprocess.Popen(
            [sys.executable, str(launcher), *args, "--proc-id", str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
    assert "data-parallel over 2 devices (2 processes)" in outs[0]

    from svcc23_fastsvc_tpu.train.checkpoint import latest_step

    assert latest_step(str(outdir)) == 4
    assert os.path.exists(outdir / "config.yml")
