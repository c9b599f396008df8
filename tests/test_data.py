"""Data pipeline: HDF5 store, scp loader, dataset, fixed-shape batcher."""

import numpy as np
import pytest

from svcc23_fastsvc_tpu.data import (
    FastSVCBatcher,
    FastSVCDataset,
    HDF5ScpLoader,
    read_hdf5,
    write_hdf5,
    validate_length,
)

HOP = 160
SR = 16000


def make_dump(tmp_path, n_utts=3, n_frames=60, ppg_dim=8, emb_dim=12, seed=0):
    rng = np.random.default_rng(seed)
    for i in range(n_utts):
        f = str(tmp_path / f"utt{i:02d}.h5")
        T = n_frames * HOP
        write_hdf5(f, "wave", rng.standard_normal(T).astype(np.float32))
        write_hdf5(f, "f0", np.abs(rng.standard_normal(n_frames)).astype(np.float32) * 200)
        write_hdf5(f, "ppg", rng.standard_normal((n_frames, ppg_dim)).astype(np.float32))
        write_hdf5(f, "lft", rng.standard_normal(T).astype(np.float32))
        write_hdf5(f, "spk_emb", rng.standard_normal((1, emb_dim)).astype(np.float32))
    return tmp_path


def test_hdf5_roundtrip_and_overwrite(tmp_path):
    f = str(tmp_path / "x.h5")
    a = np.arange(10, dtype=np.float32)
    write_hdf5(f, "wave", a)
    np.testing.assert_array_equal(read_hdf5(f, "wave"), a)
    write_hdf5(f, "wave", a * 2)
    np.testing.assert_array_equal(read_hdf5(f, "wave"), a * 2)
    with pytest.raises(KeyError):
        read_hdf5(f, "nope")


def test_scp_loader(tmp_path):
    f = str(tmp_path / "x.h5")
    write_hdf5(f, "feats", np.ones((4, 2), np.float32))
    write_hdf5(f, "other", np.zeros((4, 1), np.float32))
    scp = tmp_path / "feats.scp"
    scp.write_text(f"utt_a {f}\nutt_b {f}:other\nutt_c {f}:feats,other\n")
    loader = HDF5ScpLoader(str(scp))
    assert loader["utt_a"].shape == (4, 2)
    assert loader["utt_b"].shape == (4, 1)
    assert loader["utt_c"].shape == (4, 3)
    assert len(loader) == 3 and "utt_a" in loader


def test_dataset_and_batcher_shapes(tmp_path):
    make_dump(tmp_path)
    ds = FastSVCDataset(str(tmp_path))
    assert len(ds) == 3
    audio, f0, ppg, lft, emb = ds[0]
    assert len(audio) == len(ppg) * HOP == len(lft)

    batcher = FastSVCBatcher(
        ds, batch_size=4, batch_length=16 * HOP, hop_size=HOP, seed=1
    )
    batch = batcher.sample_batch()
    assert batch["audio"].shape == (4, 16 * HOP, 1)
    assert batch["f0"].shape == (4, 16, 1)
    assert batch["ppg"].shape == (4, 16, 8)
    assert batch["lft"].shape == (4, 16 * HOP, 1)
    assert batch["spk_emb"].shape == (4, 12)

    # crops are frame-aligned: audio window starts at multiple of hop
    # deterministic under the seed
    b2 = FastSVCBatcher(
        ds, batch_size=4, batch_length=16 * HOP, hop_size=HOP, seed=1
    ).sample_batch()
    for k in batch:
        np.testing.assert_array_equal(batch[k], b2[k])


def test_batcher_drops_short_utterances(tmp_path):
    make_dump(tmp_path, n_frames=60)
    # one extra utterance too short for the window
    f = str(tmp_path / "short.h5")
    rng = np.random.default_rng(5)
    write_hdf5(f, "wave", rng.standard_normal(10 * HOP).astype(np.float32))
    write_hdf5(f, "f0", np.ones(10, np.float32))
    write_hdf5(f, "ppg", rng.standard_normal((10, 8)).astype(np.float32))
    write_hdf5(f, "lft", rng.standard_normal(10 * HOP).astype(np.float32))
    write_hdf5(f, "spk_emb", rng.standard_normal((1, 12)).astype(np.float32))

    ds = FastSVCDataset(str(tmp_path))
    batcher = FastSVCBatcher(
        ds, batch_size=2, batch_length=40 * HOP, hop_size=HOP, seed=0
    )
    assert len(batcher.valid_idx) == 3  # short one dropped


def test_validate_length():
    xs = [np.arange(10), np.arange(12)]
    ys = [np.arange(10 * HOP), np.arange(11 * HOP)]
    x0, x1, y0, y1 = validate_length(xs, ys, HOP)
    assert len(x0) == len(x1) == 10
    assert len(y0) == len(y1) == 10 * HOP


def test_native_batch_assembler_matches_python(tmp_path):
    from svcc23_fastsvc_tpu.data.native_batch import native_batch_available

    if not native_batch_available():
        pytest.skip("libbatch.so not buildable here")
    make_dump(tmp_path)
    ds = FastSVCDataset(str(tmp_path))
    a = FastSVCBatcher(ds, batch_size=4, batch_length=16 * HOP, hop_size=HOP, seed=3)
    batch_native = a.sample_batch()
    assert a._use_native

    b = FastSVCBatcher(ds, batch_size=4, batch_length=16 * HOP, hop_size=HOP, seed=3)
    b._pack()
    b._use_native = False
    batch_py = b.sample_batch()
    for k in batch_native:
        np.testing.assert_array_equal(batch_native[k], batch_py[k])
