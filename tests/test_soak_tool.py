"""tools/soak_cli.py plumbing: the soak config must build a real train task
and the synthetic corpus must feed the real batcher (CPU, no training).
Guards the SOAK artifact pipeline against config/schema drift."""

import numpy as np


def test_soak_config_builds_task_and_corpus_feeds_batcher(tmp_path):
    import sys

    sys.path.insert(0, ".")
    from tools.soak_cli import HOP, SR, soak_config, write_corpus

    from svcc23_fastsvc_tpu.config import build_train_task
    from svcc23_fastsvc_tpu.data import FastSVCBatcher, FastSVCDataset

    cfg = soak_config(steps=100)
    task = build_train_task(cfg)
    assert task.compute_dtype is not None  # bf16 soak contract

    dumpdir = tmp_path / "dump"
    write_corpus(str(dumpdir), n_utts=3, dur_s=1.5)
    ds = FastSVCDataset(str(dumpdir))
    batcher = FastSVCBatcher(
        ds, batch_size=2, batch_length=SR, hop_size=HOP,
        use_spk_emb=True, seed=0,
    )
    batch = batcher.sample_batch()
    assert batch["audio"].shape == (2, SR, 1)
    assert batch["ppg"].shape == (2, SR // HOP, 144)
    assert batch["spk_emb"].shape == (2, 512)
    assert np.isfinite(batch["audio"]).all()
