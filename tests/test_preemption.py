"""Graceful preemption: SIGTERM mid-training checkpoints at the next step
boundary, exits 75 (EX_TEMPFAIL), and --resume continues from the saved
step — the elastic-recovery story preemptible TPU fleets need (the
reference only has the crash-path finally-save,
/root/reference/harana/bin/train_fastsvc.py:812-819)."""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LAUNCH = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from svcc23_fastsvc_tpu.bin.train_fastsvc import main
main(sys.argv[1:])
"""

SR, HOP = 16000, 160


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    """Tiny normalized-format dump written directly (the training CLI only
    needs the FastSVCDataset field contract)."""
    from svcc23_fastsvc_tpu.data.hdf5 import write_hdf5

    root = tmp_path_factory.mktemp("preempt")
    dump = root / "dump"
    dump.mkdir()
    rng = np.random.default_rng(0)
    frames = 120
    for j in range(3):
        n = frames * HOP
        write_hdf5(str(dump / f"utt{j}.h5"), "wave",
                   0.3 * rng.standard_normal(n).astype(np.float32))
        write_hdf5(str(dump / f"utt{j}.h5"), "f0",
                   np.full(frames, 150.0, np.float32))
        write_hdf5(str(dump / f"utt{j}.h5"), "ppg",
                   rng.standard_normal((frames, 8)).astype(np.float32))
        write_hdf5(str(dump / f"utt{j}.h5"), "lft",
                   rng.standard_normal(n).astype(np.float32))
        write_hdf5(str(dump / f"utt{j}.h5"), "spk_emb",
                   rng.standard_normal((1, 16)).astype(np.float32))

    cfg = {
        "sampling_rate": SR,
        "hop_size": HOP,
        "generator_params": {
            "in_channels": 8,
            "mid_channels": [4, 4],
            "upsampling_scales": [8, 20],
            "spk_emb_size": 16,
            "use_spk_emb": True,
        },
        "discriminator_params": {
            "scales": 1, "channels": 4,
            "max_downsample_channels": 8, "downsample_scales": [4],
        },
        "stft_loss_params": {
            "fft_sizes": [64], "hop_sizes": [16], "win_lengths": [64],
        },
        "batch_size": 2,
        "batch_length": 1600,
        "signal_generator": {"sine_amp": 0.1, "noise_amp": 0.0,
                             "signal_types": ["sine"]},
        "discriminator_train_start_steps": 0,
        "train_max_steps": 100000,   # far beyond what we let it run
        "save_interval_steps": 100000,
        "eval_interval_steps": 100000,
        "log_interval_steps": 5,
        "loader_threads": 1,
    }
    (root / "config.yml").write_text(yaml.safe_dump(cfg))
    return root


def test_sigterm_checkpoints_and_resume(workdir):
    outdir = workdir / "exp"
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    argv = ["--train-dumpdir", str(workdir / "dump"),
            "--outdir", str(outdir),
            "--config", str(workdir / "config.yml"),
            "--n-devices", "1"]
    log = open(workdir / "train.log", "w")
    proc = subprocess.Popen(
        [sys.executable, "-c", LAUNCH, *argv],
        stdout=log, stderr=subprocess.STDOUT, env=env, cwd=REPO,
    )
    try:
        # wait until the loop is actually stepping (first flushed step log)
        deadline = time.time() + 300
        logged = False
        while time.time() < deadline:
            if proc.poll() is not None:
                break
            txt = (workdir / "train.log").read_text()
            if "step " in txt and "steps_per_s" in txt:
                logged = True
                break
            time.sleep(0.5)
        assert logged, (workdir / "train.log").read_text()[-3000:]
        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=180)
    finally:
        if proc.poll() is None:
            proc.kill()
        log.close()
    txt = (workdir / "train.log").read_text()
    assert rc == 75, f"rc={rc}\n{txt[-3000:]}"
    assert "preempted at step" in txt

    from svcc23_fastsvc_tpu.train.checkpoint import latest_step

    saved = latest_step(str(outdir))
    assert saved is not None and 0 < saved < 100000

    # resume: run to saved+3 steps in-process and confirm it picks up
    resume_cfg = yaml.safe_load((workdir / "config.yml").read_text())
    resume_cfg["train_max_steps"] = saved + 3
    (workdir / "config_resume.yml").write_text(yaml.safe_dump(resume_cfg))
    r = subprocess.run(
        [sys.executable, "-c", LAUNCH,
         "--train-dumpdir", str(workdir / "dump"),
         "--outdir", str(outdir),
         "--config", str(workdir / "config_resume.yml"),
         "--n-devices", "1", "--resume"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert f"resumed from step {saved}" in (r.stdout + r.stderr)
    assert latest_step(str(outdir)) == saved + 3
