"""ctypes binding for the native batch assembler (native/batch_assembler.cpp).

Two layers:
  * assemble_batch — drops into FastSVCBatcher's vectorized path: the four
    window copies for a whole batch run in C++ threads with the GIL
    released, so producers scale to memory bandwidth instead of the
    interpreter.
  * NativeBatchProducer — the fully GIL-free producer loop: C++ worker
    threads own the crop RNG, the assembly, and a ring of pre-allocated
    slots; Python only hands out zero-copy numpy views of filled slots.
    Replaces prefetch.BatcherPool on many-chip hosts where even the
    per-batch Python RNG/dict/queue work contends with the training loop.
    (Reference counterpart: torch DataLoader worker processes,
    /root/reference/harana/bin/train_fastsvc.py:438-557.)

    Measured at the production geometry (B=32, 1 s @ 24 kHz crops,
    144-d ppg, 512-d emb, 447 MB packed store): 716 batches/s at 2 C++
    workers vs 222 batches/s for the best Python-pool configuration —
    and the pool *degrades* as threads are added (GIL contention with
    the consumer), while the native loop scales until memory bandwidth.
    716 batches/s = ~23k audio-s/s of feed, >90x one chip's training
    consumption, so a single host can feed a few dozen chips.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from functools import lru_cache

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libbatch.so")

_f32p = ctypes.POINTER(ctypes.c_float)
_i64p = ctypes.POINTER(ctypes.c_long)


@lru_cache(maxsize=1)
def _load_lib():
    if not os.path.exists(_SO_PATH):
        if not os.path.exists(os.path.join(_NATIVE_DIR, "batch_assembler.cpp")):
            return None
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR, "libbatch.so"],
                           check=True, capture_output=True, timeout=120)
        except Exception as e:
            logging.warning("could not build libbatch.so: %s", e)
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError as e:
        logging.warning("could not load libbatch.so: %s", e)
        return None
    lib.assemble_fastsvc_batch.restype = ctypes.c_int
    lib.assemble_fastsvc_batch.argtypes = [
        _f32p, _f32p, _f32p, _f32p,
        ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long,
        _i64p, _i64p,
        ctypes.c_long, ctypes.c_long, ctypes.c_long,
        _f32p, _f32p, _f32p, _f32p,
        ctypes.c_int,
    ]
    lib.producer_start.restype = ctypes.c_void_p
    lib.producer_start.argtypes = [
        _f32p, _f32p, _f32p, _f32p, _f32p, _i64p,
        ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ctypes.c_long,
        ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long,
        _f32p, _f32p, _f32p, _f32p, _f32p, _i64p, _i64p,
        ctypes.c_long, ctypes.c_int, ctypes.c_ulonglong,
    ]
    lib.producer_next.restype = ctypes.c_long
    lib.producer_next.argtypes = [ctypes.c_void_p]
    lib.producer_release.restype = None
    lib.producer_release.argtypes = [ctypes.c_void_p, ctypes.c_long]
    lib.producer_stop.restype = None
    lib.producer_stop.argtypes = [ctypes.c_void_p]
    return lib


def native_batch_available() -> bool:
    return _load_lib() is not None


def assemble_batch(packed: dict, rows: np.ndarray, starts: np.ndarray,
                   frames: int, hop: int, *, n_threads: int = 4):
    """Gather B random windows from the packed store with native threads.

    Returns dict with audio (B,L,1), f0 (B,F,1), ppg (B,F,D), lft (B,L,1).
    """
    lib = _load_lib()
    assert lib is not None
    B = len(rows)
    L = frames * hop
    D = packed["ppg"].shape[-1]
    out = {
        "audio": np.empty((B, L, 1), np.float32),
        "f0": np.empty((B, frames, 1), np.float32),
        "ppg": np.empty((B, frames, D), np.float32),
        "lft": np.empty((B, L, 1), np.float32),
    }
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    rc = lib.assemble_fastsvc_batch(
        packed["audio"].ctypes.data_as(_f32p),
        packed["f0"].ctypes.data_as(_f32p),
        packed["ppg"].ctypes.data_as(_f32p),
        packed["lft"].ctypes.data_as(_f32p),
        packed["audio"].shape[0], packed["audio"].shape[1],
        packed["f0"].shape[1], D,
        rows.ctypes.data_as(_i64p), starts.ctypes.data_as(_i64p),
        B, frames, hop,
        out["audio"].ctypes.data_as(_f32p),
        out["f0"].ctypes.data_as(_f32p),
        out["ppg"].ctypes.data_as(_f32p),
        out["lft"].ctypes.data_as(_f32p),
        n_threads,
    )
    if rc != 0:
        raise RuntimeError(f"assemble_fastsvc_batch failed: {rc}")
    return out


class NativeBatchProducer:
    """Iterator of training batches produced entirely by C++ threads.

    `hold` is how many previously-yielded slots stay valid after each
    __next__ — callers that buffer K batches before consuming them (the
    steps_per_call stacking in train/loop.py:214) must pass hold >= K.
    Per-worker crop streams are deterministic in `seed`; the slot
    interleave across workers is not (same contract as
    prefetch.BatcherPool). Yields zero-copy views: consume (or copy) a
    batch before iterating `hold` more times.
    """

    is_prefetching = True  # train/loop.py: do not wrap in PrefetchIterator

    def __init__(self, packed: dict, *, batch_size: int, frames: int,
                 hop: int, acw: int = 0, use_spk_emb: bool = True,
                 n_threads: int = 3, depth: int | None = None,
                 hold: int = 2, seed: int = 0, collect_crops: bool = False):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("libbatch.so unavailable")
        self._lib = lib
        B, F, L = batch_size, frames, frames * hop
        D = packed["ppg"].shape[-1]
        self._hold = max(1, hold)
        depth = depth if depth is not None else self._hold + n_threads + 2
        if depth < self._hold + 2:
            raise ValueError(f"depth {depth} < hold {self._hold} + 2")
        # keep the borrowed source store alive for the producer's lifetime
        self._packed = {k: np.ascontiguousarray(v) for k, v in packed.items()}
        p = self._packed
        emb = p.get("spk_emb") if use_spk_emb else None
        self._slots = {
            "audio": np.empty((depth, B, L), np.float32),
            "f0": np.empty((depth, B, F), np.float32),
            "ppg": np.empty((depth, B, F, D), np.float32),
            "lft": np.empty((depth, B, L), np.float32),
            "rows": np.empty((depth, B), np.int64),
            "starts": np.empty((depth, B), np.int64),
        }
        if emb is not None:
            self._slots["spk_emb"] = np.empty(
                (depth, B, emb.shape[-1]), np.float32
            )
        s = self._slots
        nf = np.ascontiguousarray(p["n_frames"], dtype=np.int64)
        self._packed["n_frames"] = nf
        self._handle = lib.producer_start(
            p["audio"].ctypes.data_as(_f32p),
            p["f0"].ctypes.data_as(_f32p),
            p["ppg"].ctypes.data_as(_f32p),
            p["lft"].ctypes.data_as(_f32p),
            emb.ctypes.data_as(_f32p) if emb is not None else None,
            nf.ctypes.data_as(_i64p),
            p["audio"].shape[0], p["audio"].shape[1], p["f0"].shape[1], D,
            emb.shape[-1] if emb is not None else 0,
            B, F, hop, acw,
            s["audio"].ctypes.data_as(_f32p),
            s["f0"].ctypes.data_as(_f32p),
            s["ppg"].ctypes.data_as(_f32p),
            s["lft"].ctypes.data_as(_f32p),
            s["spk_emb"].ctypes.data_as(_f32p) if emb is not None else None,
            s["rows"].ctypes.data_as(_i64p),
            s["starts"].ctypes.data_as(_i64p),
            depth, n_threads, seed,
        )
        if not self._handle:
            raise RuntimeError("producer_start failed")
        self._use_emb = emb is not None
        self._collect_crops = collect_crops
        self._live: list[int] = []  # yielded slots not yet released

    def __iter__(self):
        return self

    def __next__(self):
        if self._handle is None:
            raise StopIteration
        while len(self._live) >= self._hold:
            self._lib.producer_release(self._handle, self._live.pop(0))
        slot = self._lib.producer_next(self._handle)
        if slot < 0:
            raise StopIteration
        self._live.append(slot)
        s = self._slots
        out = {
            "audio": s["audio"][slot][..., None],
            "f0": s["f0"][slot][..., None],
            "ppg": s["ppg"][slot],
            "lft": s["lft"][slot][..., None],
        }
        if self._use_emb:
            out["spk_emb"] = s["spk_emb"][slot]
        if self._collect_crops:
            out["_rows"] = s["rows"][slot]
            out["_starts"] = s["starts"][slot]
        return out

    def close(self):
        if self._handle is not None:
            self._lib.producer_stop(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def make_native_producer(batcher, *, n_threads: int = 3, seed: int = 0,
                         hold: int = 2):
    """Build a NativeBatchProducer from a FastSVCBatcher, or None if the
    native library is unavailable or the config needs the Python path
    (aux context windows crop a wider ppg window than the packed store
    gather supports)."""
    if not native_batch_available() or batcher.acw != 0:
        return None
    if batcher._packed is None:
        batcher._pack()
    return NativeBatchProducer(
        batcher._packed,
        batch_size=batcher.batch_size,
        frames=batcher.batch_frames,
        hop=batcher.hop_size,
        acw=batcher.acw,
        use_spk_emb=batcher.use_spk_emb,
        n_threads=n_threads,
        seed=seed,
        hold=hold,
    )
