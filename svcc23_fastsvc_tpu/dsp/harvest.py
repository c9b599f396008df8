"""ctypes binding for the native Harvest-style F0 estimator.

The reference's F0 front end is pyworld.harvest (C++ WORLD). This binds the
framework's own native implementation (native/harvest.cpp) — serial
heuristic DSP that is deliberately NOT expressed in XLA (SURVEY.md §2,
native item 1). Falls back to the jittable YIN estimator when the shared
library can't be built (e.g. no compiler in the deployment image).
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
_SO_PATH = os.path.join(_NATIVE_DIR, "libharvest.so")


@lru_cache(maxsize=1)
def _load_lib():
    if not os.path.exists(_SO_PATH):
        src = os.path.join(_NATIVE_DIR, "harvest.cpp")
        if not os.path.exists(src):
            return None
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True,
                capture_output=True, timeout=120,
            )
        except Exception as e:
            logging.warning("could not build libharvest.so: %s", e)
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError as e:
        logging.warning("could not load libharvest.so: %s", e)
        return None
    lib.harvest_f0.restype = ctypes.c_int
    lib.harvest_f0.argtypes = [
        ctypes.POINTER(ctypes.c_double),  # x
        ctypes.c_long,                    # length
        ctypes.c_double,                  # fs
        ctypes.c_double,                  # f0_floor
        ctypes.c_double,                  # f0_ceil
        ctypes.c_double,                  # frame_period_ms
        ctypes.POINTER(ctypes.c_double),  # f0_out
        ctypes.c_long,                    # n_frames_cap
    ]
    return lib


def harvest_available() -> bool:
    return _load_lib() is not None


def harvest_f0(
    x,
    *,
    fs: int,
    f0_floor: float = 70.0,
    f0_ceil: float = 340.0,
    frame_period_ms: float = 10.0,
):
    """Harvest-style F0: (T,) signal → (T//hop + 1,) Hz, 0 = unvoiced.

    Frame count matches pyworld.harvest's convention at the same
    frame_period. Falls back to YIN if the native library is unavailable.
    """
    x = np.ascontiguousarray(np.asarray(x, dtype=np.float64))
    hop = round(fs * frame_period_ms / 1000.0)
    n_frames = len(x) // hop + 1

    lib = _load_lib()
    if lib is None:
        from .f0 import yin_f0
        import jax.numpy as jnp

        logging.warning("libharvest.so unavailable; falling back to YIN")
        return np.asarray(
            yin_f0(jnp.asarray(x, jnp.float32), sr=fs, hop=int(hop),
                   f0_floor=f0_floor, f0_ceil=f0_ceil)
        ).astype(np.float64)

    out = np.zeros(n_frames, dtype=np.float64)
    rc = lib.harvest_f0(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(x), float(fs), float(f0_floor), float(f0_ceil),
        float(frame_period_ms),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n_frames,
    )
    if rc != 0:
        raise RuntimeError(f"harvest_f0 failed with code {rc}")
    return out
