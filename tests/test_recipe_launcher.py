"""Recipe-driver-level launcher integration: `run.py --n-jobs K` fans
stage 1 feature extraction over K scp-sharded subprocesses through the
launcher (the reference's `${train_cmd} JOB=1:n_jobs` + split_scp.pl path,
/root/reference/egs/svcc23/fastsvc1/run.sh:64-87)."""

import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUN_PY = os.path.join(REPO, "egs", "svcc23", "fastsvc1", "run.py")


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from svcc23_fastsvc_tpu.bin.common import write_wav

    sr, hop = 16000, 160
    root = tmp_path_factory.mktemp("recipe_launcher")
    wavdir = root / "wav"
    wavdir.mkdir()
    (root / "data" / "train").mkdir(parents=True)
    rng = np.random.default_rng(0)
    lines = []
    for spk, f0 in (("spkA", 150.0), ("spkB", 240.0)):
        for j in range(2):
            t = np.arange(int(1.1 * sr)) / sr
            x = (0.3 * np.sin(2 * np.pi * f0 * t)
                 + 0.002 * rng.standard_normal(len(t)))
            path = wavdir / f"{spk}_{j:03d}.wav"
            write_wav(str(path), x.astype(np.float32), sr)
            lines.append(f"{spk}_{j:03d} {path}")
    (root / "data" / "train" / "wav.scp").write_text("\n".join(lines) + "\n")

    cfg = {
        "sampling_rate": sr,
        "hop_size": hop,
        "lft_hop_size": 64,
        "shiftms": 10,
        "signal_generator": {"sine_amp": 0.1, "noise_amp": 0.0,
                             "signal_types": ["sine"]},
    }
    (root / "config.yml").write_text(yaml.safe_dump(cfg))

    # The session's axon sitecustomize re-forces the TPU tunnel backend in
    # every fresh interpreter; shadow it with a CPU-pinning stub so the
    # launched array jobs run on the CPU backend (conftest.py does the
    # in-process equivalent).
    stub = root / "pin_cpu"
    stub.mkdir()
    (stub / "sitecustomize.py").write_text(
        "import os\nos.environ['JAX_PLATFORMS'] = 'cpu'\n"
    )
    return root


def test_stage1_launcher_array(corpus):
    env = dict(os.environ)
    env["PYTHONPATH"] = str(corpus / "pin_cpu")
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, RUN_PY, "--stage", "0", "--stop-stage", "1",
         "--conf", str(corpus / "config.yml"),
         "--f0-conf", str(corpus / "nonexistent_f0.yml"),
         "--datadir", str(corpus / "data"),
         "--dumpdir", str(corpus / "dump"),
         "--expdir", str(corpus / "exp"),
         "--n-jobs", "2"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]

    # both shards' logs exist and each processed a disjoint utterance subset
    logs = sorted(os.listdir(corpus / "exp" / "log"))
    assert logs == ["preprocess_train.0.log", "preprocess_train.1.log"]

    h5s = sorted(f for f in os.listdir(corpus / "dump" / "train")
                 if f.endswith(".h5"))
    assert len(h5s) == 4  # all utterances, across both shards

    from svcc23_fastsvc_tpu.data import FastSVCDataset

    ds = FastSVCDataset(str(corpus / "dump" / "train"))
    audio, f0, ppg, lft, emb = ds[0]
    assert len(audio) == len(ppg) * 160 == len(lft)
