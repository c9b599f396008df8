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


def test_parse_intervals_reads_instrumented_flush_lines():
    """The soak artifact reads the loop's instrumented per-interval fields
    (audio_s_per_s + wall-time attribution, train/loop.py _flush_logs)."""
    import sys

    sys.path.insert(0, ".")
    from tools.soak_cli import parse_intervals

    log = (
        "2026-08-19 10:00:00 (loop:380) INFO: step 320: audio_s_per_s=412.3, "
        "data_wait_s=0.4100, discriminator_loss=0.9000, eval_s=0.0000, "
        "save_s=0.0000, step_wait_s=23.1000, steps_per_s=12.9\n"
        "noise line\n"
        "2026-08-19 10:01:00 (loop:380) INFO: step 640: audio_s_per_s=128.6, "
        "data_wait_s=61.2000, discriminator_loss=0.8500, eval_s=0.0000, "
        "save_s=1.5000, step_wait_s=12.0000, steps_per_s=4.0\n"
    )
    got = parse_intervals(log)
    assert len(got) == 2
    assert got[0]["audio_s_per_s"] == 412.3
    assert got[1]["data_wait_s"] == 61.2
    assert got[1]["save_s"] == 1.5
    assert got[0]["discriminator_loss"] == 0.9


def test_soak_config_eval_and_save_intervals():
    import sys

    sys.path.insert(0, ".")
    from tools.soak_cli import soak_config

    cfg = soak_config(1000, eval_every=200, save_every=500)
    assert cfg["eval_interval_steps"] == 200
    assert cfg["save_interval_steps"] == 500
    assert cfg["num_save_intermediate_results"] > 0
