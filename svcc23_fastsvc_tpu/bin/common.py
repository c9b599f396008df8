"""Shared CLI helpers: wav.scp parsing, WAV IO, resampling, logging.

The reference reads Kaldi wav.scp via kaldiio and audio via soundfile;
neither is available here, so WAV IO is scipy-based (PCM16/24/32 + float)
and resampling is polyphase (scipy.signal.resample_poly) — numerically a
different filter than librosa 0.8.1's (soxr/kaiser) resampler, which only
affects feature extraction inputs, not the training contract.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Iterator, Tuple

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly


def setup_logging(verbose: int = 1):
    level = logging.WARNING if verbose <= 0 else (
        logging.INFO if verbose == 1 else logging.DEBUG
    )
    # force=True: jax/absl may have installed a root handler already, which
    # would silently turn basicConfig into a no-op and suppress INFO logs
    logging.basicConfig(
        level=level,
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
        force=True,
    )
    honor_jax_platforms_env()
    enable_compile_cache()


def enable_compile_cache(cache_dir: str | None = None):
    """Point JAX at a persistent on-disk compilation cache.

    A preempted job (SIGTERM -> checkpoint -> exit 75 -> restart --resume)
    otherwise recompiles every step program from scratch — exactly when fast
    restart matters. Default location is ~/.cache/svcc23_fastsvc_tpu/jax_cache,
    overridable with SVCC_JAX_CACHE_DIR (set it empty to disable).

    Returns the cache dir in use, or None if disabled/unavailable.
    """
    if cache_dir is None:
        cache_dir = os.environ.get("SVCC_JAX_CACHE_DIR")
        if cache_dir == "":
            return None
        if cache_dir is None:
            cache_dir = os.path.join(
                os.path.expanduser("~"), ".cache", "svcc23_fastsvc_tpu",
                "jax_cache",
            )
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # step programs on the tunnel backend compile in tens of seconds;
        # cache anything non-trivial
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        # cache even on single-process CPU runs (tests/dev); default policy
        # skips "cheap" programs on some versions
        try:
            jax.config.update(
                "jax_persistent_cache_min_entry_size_bytes", 0
            )
        except Exception:
            pass
        return cache_dir
    except Exception as e:  # never fail a CLI over cache plumbing
        logging.warning("compile cache unavailable: %s", e)
        return None


def honor_jax_platforms_env():
    """Make the JAX_PLATFORMS env var authoritative for CLI runs.

    Some environments install a sitecustomize hook that re-forces a platform
    via jax.config after the interpreter starts, silently overriding the env
    var. CLIs re-assert the user's choice before any computation runs.
    """
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    try:
        import jax

        if jax.config.jax_platforms != plat:
            jax.config.update("jax_platforms", plat)
    except Exception as e:  # backend already initialized differently
        logging.warning("could not apply JAX_PLATFORMS=%s: %s", plat, e)


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Read a WAV file to float64 in [-1, 1]."""
    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data / (1 << 15)
    elif data.dtype == np.int32:
        data = data / (1 << 31)
    elif data.dtype == np.uint8:
        data = (data.astype(np.float64) - 128.0) / 128.0
    else:
        data = data.astype(np.float64)
    return np.asarray(data, dtype=np.float64), sr


def write_wav(path: str, audio, sr: int):
    """Write float audio in [-1, 1] as PCM16 (reference decode writes
    PCM_16, decode_fastsvc.py:197)."""
    audio = np.asarray(audio, dtype=np.float64).squeeze()
    pcm = np.clip(audio, -1.0, 1.0 - 1.0 / (1 << 15))
    wavfile.write(path, sr, (pcm * (1 << 15)).astype(np.int16))


def read_wav_scp(path: str) -> Dict[str, str]:
    """Parse a Kaldi wav.scp (utt_id -> wav path; pipes unsupported)."""
    out = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            utt, wav = line.split(maxsplit=1)
            if wav.endswith("|"):
                raise ValueError(
                    "pipe-style wav.scp entries are not supported; "
                    f"got {wav!r}"
                )
            out[utt] = wav
    return out


def iter_wav_scp(path: str) -> Iterator[Tuple[str, np.ndarray, int]]:
    for utt, wav_path in read_wav_scp(path).items():
        audio, sr = read_wav(wav_path)
        yield utt, audio, sr


def resample(audio: np.ndarray, sr: int, target_sr: int) -> np.ndarray:
    if sr == target_sr:
        return audio
    from math import gcd

    g = gcd(sr, target_sr)
    return resample_poly(audio, target_sr // g, sr // g)


def utt_speaker(utt_id: str) -> str:
    """Speaker id convention: prefix before the first underscore
    (reference compute_f0stats.py / decode use utt prefixes)."""
    return utt_id.split("_")[0]
