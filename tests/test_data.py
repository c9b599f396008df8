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


def test_native_producer_windows_and_determinism(tmp_path):
    """The C++ producer loop yields exact packed-store windows, its crop
    stream is deterministic per seed (single worker), and spk_emb rides the
    row gather."""
    from svcc23_fastsvc_tpu.data.native_batch import (
        NativeBatchProducer,
        native_batch_available,
    )

    if not native_batch_available():
        pytest.skip("libbatch.so not buildable here")
    make_dump(tmp_path, n_utts=4, n_frames=64)
    ds = FastSVCDataset(str(tmp_path))
    base = FastSVCBatcher(ds, batch_size=4, batch_length=16 * HOP,
                          hop_size=HOP, seed=0)
    base._pack()
    packed = base._packed

    def mk(seed, collect=True):
        return NativeBatchProducer(
            packed, batch_size=4, frames=16, hop=HOP, use_spk_emb=True,
            n_threads=1, seed=seed, collect_crops=collect,
        )

    prod = mk(seed=11)
    crops_a = []
    try:
        for _ in range(6):
            b = next(prod)
            rows, starts = b["_rows"].copy(), b["_starts"].copy()
            crops_a.append((rows, starts))
            for i, (r, st) in enumerate(zip(rows, starts)):
                assert 0 <= st <= packed["n_frames"][r] - 16
                np.testing.assert_array_equal(
                    b["audio"][i, :, 0],
                    packed["audio"][r, st * HOP: (st + 16) * HOP],
                )
                np.testing.assert_array_equal(
                    b["f0"][i, :, 0], packed["f0"][r, st: st + 16]
                )
                np.testing.assert_array_equal(
                    b["ppg"][i], packed["ppg"][r, st: st + 16]
                )
                np.testing.assert_array_equal(
                    b["lft"][i, :, 0],
                    packed["lft"][r, st * HOP: (st + 16) * HOP],
                )
                np.testing.assert_array_equal(
                    b["spk_emb"][i], packed["spk_emb"][r]
                )
    finally:
        prod.close()

    prod_b = mk(seed=11)
    try:
        for rows_a, starts_a in crops_a:
            b = next(prod_b)
            np.testing.assert_array_equal(b["_rows"], rows_a)
            np.testing.assert_array_equal(b["_starts"], starts_a)
    finally:
        prod_b.close()

    prod_c = mk(seed=12)
    try:
        b = next(prod_c)
        assert not (
            np.array_equal(b["_rows"], crops_a[0][0])
            and np.array_equal(b["_starts"], crops_a[0][1])
        )
    finally:
        prod_c.close()


def test_native_producer_hold_window(tmp_path):
    """Yielded views stay intact for `hold` further iterations (the
    steps_per_call stacking contract in train/loop.py)."""
    from svcc23_fastsvc_tpu.data.native_batch import (
        NativeBatchProducer,
        native_batch_available,
    )

    if not native_batch_available():
        pytest.skip("libbatch.so not buildable here")
    make_dump(tmp_path, n_utts=3, n_frames=64)
    ds = FastSVCDataset(str(tmp_path))
    base = FastSVCBatcher(ds, batch_size=2, batch_length=8 * HOP,
                          hop_size=HOP, seed=0)
    base._pack()
    prod = NativeBatchProducer(
        base._packed, batch_size=2, frames=8, hop=HOP, use_spk_emb=True,
        n_threads=2, hold=4, seed=3,
    )
    try:
        held = []
        for _ in range(4):
            b = next(prod)
            held.append((b, {k: v.copy() for k, v in b.items()}))
        # all four yielded views must still match their snapshot
        for b, snap in held:
            for k in snap:
                np.testing.assert_array_equal(b[k], snap[k])
    finally:
        prod.close()


def test_make_native_producer_gates(tmp_path):
    """Factory declines acw>0 configs and matches the batcher geometry."""
    from svcc23_fastsvc_tpu.data.native_batch import (
        make_native_producer,
        native_batch_available,
    )

    if not native_batch_available():
        pytest.skip("libbatch.so not buildable here")
    make_dump(tmp_path, n_utts=3, n_frames=64)
    ds = FastSVCDataset(str(tmp_path))
    b = FastSVCBatcher(ds, batch_size=3, batch_length=16 * HOP,
                       hop_size=HOP, seed=0, aux_context_window=2)
    assert make_native_producer(b) is None
    b2 = FastSVCBatcher(ds, batch_size=3, batch_length=16 * HOP,
                        hop_size=HOP, seed=0)
    prod = make_native_producer(b2, n_threads=2, seed=5)
    assert prod is not None
    try:
        ref = b2.sample_batch()
        out = next(prod)
        assert set(out) == set(ref)
        for k in ref:
            assert out[k].shape == ref[k].shape, k
            assert out[k].dtype == ref[k].dtype, k
    finally:
        prod.close()


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
