"""ctypes binding for the native batch assembler (native/batch_assembler.cpp).

Drops into FastSVCBatcher's vectorized path: the four window copies for a
whole batch run in C++ threads with the GIL released, so producers scale to
memory bandwidth instead of the interpreter.
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
