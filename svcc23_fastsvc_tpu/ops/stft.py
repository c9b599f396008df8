"""STFT / spectral feature ops, XLA-native.

Numerics track the exact primitives the reference calls:
  * torch.stft(center=True, pad_mode="reflect") — used by the multi-resolution
    STFT loss (/root/reference/harana/losses/stft_loss.py:21-50) and the PPG
    frontend (/root/reference/harana/ppg/stft.py:71-94),
  * librosa 0.8.1 stft / fft_frequencies / A_weighting / perceptual_weighting /
    db_to_amplitude — used by loudness extraction
    (/root/reference/harana/bin/preprocess_fastsvc.py:60-75).

Framing is a static-index gather so the whole pipeline stays inside one XLA
computation (no data-dependent shapes); the FFT runs as jnp.fft.rfft over the
frame axis.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from .resample import nearest_upsample


def hann_window(win_length: int, dtype=jnp.float32):
    """Periodic Hann window: torch.hann_window / scipy fftbins=True."""
    n = np.arange(win_length, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    return jnp.asarray(w, dtype=dtype)


def _num_frames(padded_len: int, fft_size: int, hop: int) -> int:
    return 1 + (padded_len - fft_size) // hop


def frame_signal(x, frame_length: int, hop: int):
    """Split (..., T) into (..., n_frames, frame_length) frames.

    When hop divides frame_length (every config in this codebase: the loss
    resolutions are all 4x-overlap, the frontends hop-align), framing is
    built from k = frame_length//hop shifted strided reshapes — slices whose
    adjoint is pad+add, so the STFT-loss backward avoids the scatter-add a
    gather adjoint would produce (a large cost on TPU). Falls back to a
    static-index gather otherwise.
    """
    T = x.shape[-1]
    n_frames = _num_frames(T, frame_length, hop)
    if frame_length % hop == 0:
        k = frame_length // hop
        batch_shape = x.shape[:-1]
        n_chunks = T // hop
        xc = x[..., : n_chunks * hop].reshape(*batch_shape, n_chunks, hop)
        parts = [xc[..., i : i + n_frames, :] for i in range(k)]
        return jnp.concatenate(parts, axis=-1)
    idx = (
        np.arange(n_frames)[:, None] * hop + np.arange(frame_length)[None, :]
    )
    return jnp.take(x, jnp.asarray(idx), axis=-1)


def stft(
    x,
    fft_size: int,
    hop: int,
    win_length: int | None = None,
    *,
    window=None,
    center: bool = True,
    pad_mode: str = "reflect",
):
    """Complex STFT of (..., T) → (..., n_frames, fft_size//2+1).

    torch.stft semantics: window of win_length is zero-padded centered to
    fft_size; with center=True the signal is padded fft_size//2 both sides.
    """
    if win_length is None:
        win_length = fft_size
    if window is None:
        window = hann_window(win_length, dtype=x.dtype)
    if win_length < fft_size:
        lpad = (fft_size - win_length) // 2
        window = jnp.pad(window, (lpad, fft_size - win_length - lpad))
    if center:
        pad = fft_size // 2
        pad_width = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
        x = jnp.pad(x, pad_width, mode=pad_mode)
    frames = frame_signal(x, fft_size, hop) * window
    return jnp.fft.rfft(frames, axis=-1)


def stft_magnitude(
    x,
    fft_size: int,
    hop: int,
    win_length: int | None = None,
    *,
    window=None,
    center: bool = True,
    pad_mode: str = "reflect",
    power: bool = False,
    clamp_min: float = 1e-7,
):
    """Magnitude (or power) spectrogram matching the reference stft() helper
    (/root/reference/harana/losses/stft_loss.py:21-50), incl. the 1e-7 clamp.

    Returns (..., n_frames, fft_size//2+1).
    """
    z = stft(
        x, fft_size, hop, win_length, window=window, center=center, pad_mode=pad_mode
    )
    p = jnp.clip(jnp.real(z) ** 2 + jnp.imag(z) ** 2, min=clamp_min)
    return p if power else jnp.sqrt(p)


# ---------------------------------------------------------------------------
# librosa-0.8.1-compatible auxiliaries (feature extraction path).
# ---------------------------------------------------------------------------


def fft_frequencies(sr: int, n_fft: int) -> np.ndarray:
    return np.linspace(0, sr / 2.0, 1 + n_fft // 2, endpoint=True)


def a_weighting_db(frequencies, min_db: float = -80.0) -> np.ndarray:
    """A-weighting in dB per frequency (librosa 0.8.1 constants)."""
    f_sq = np.asarray(frequencies, dtype=np.float64) ** 2
    const = np.array([12200.0, 20.6, 107.7, 737.9]) ** 2
    with np.errstate(divide="ignore"):
        weights = 2.0 + 20.0 * (
            np.log10(const[0])
            + 2 * np.log10(np.where(f_sq > 0, f_sq, 1e-300))
            - np.log10(f_sq + const[0])
            - np.log10(f_sq + const[1])
            - 0.5 * np.log10(f_sq + const[2])
            - 0.5 * np.log10(f_sq + const[3])
        )
    if min_db is not None:
        weights = np.maximum(min_db, weights)
    return weights


def power_to_db(S, ref: float = 1.0, amin: float = 1e-10, top_db: float = 80.0):
    """librosa.power_to_db with the global top_db clamp."""
    log_spec = 10.0 * jnp.log10(jnp.maximum(amin, S))
    log_spec = log_spec - 10.0 * math.log10(max(amin, ref))
    if top_db is not None:
        log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - top_db)
    return log_spec


def db_to_amplitude(S_db, ref: float = 1.0):
    return ref * jnp.power(10.0, 0.5 * S_db / 10.0)


def loudness_extract(audio, sampling_rate: int, hop_length: int, n_fft: int = 2048):
    """A-weighted log-loudness at sample rate.

    Reference: /root/reference/harana/bin/preprocess_fastsvc.py:60-75 —
    librosa.stft(hop) → power → perceptual_weighting (A-weight + power_to_db
    with 80 dB floor) → db_to_amplitude → mean over freq → log(. + 1e-5) →
    nearest-upsample ×hop to sample resolution.

    Args:
        audio: (T,) float signal.
    Returns:
        (T // hop + 1) * hop_length log-loudness samples, jnp array.
    """
    power = stft_magnitude(
        audio,
        n_fft,
        hop_length,
        n_fft,
        center=True,
        pad_mode="reflect",
        power=True,
        clamp_min=0.0,
    ).T  # (freq, frames)
    weights = jnp.asarray(
        a_weighting_db(fft_frequencies(sampling_rate, n_fft)), dtype=power.dtype
    )
    loud_db = power_to_db(power) + weights[:, None]
    loud = db_to_amplitude(loud_db)
    loud = jnp.log(jnp.mean(loud, axis=0) + 1e-5)  # (frames,)
    return nearest_upsample(loud[None, :, None], hop_length, axis=1)[0, :, 0]


# ---------------------------------------------------------------------------
# Mel filterbank (slaney scale/norm, librosa-compatible) for the PPG frontend.
# ---------------------------------------------------------------------------


def _hz_to_mel(f, htk: bool = False):
    f = np.asarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels
    )


def _mel_to_hz(m, htk: bool = False):
    m = np.asarray(m, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs
    )


def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: float | None = None,
    *,
    htk: bool = False,
    norm: str | None = "slaney",
    dtype=jnp.float32,
):
    """(n_freqs, n_mels) triangular mel filterbank, librosa-compatible."""
    if fmax is None:
        fmax = sr / 2.0
    fftfreqs = fft_frequencies(sr, n_fft)
    mel_pts = _mel_to_hz(
        np.linspace(_hz_to_mel(fmin, htk), _hz_to_mel(fmax, htk), n_mels + 2), htk
    )
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    if norm == "slaney":
        enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
        weights *= enorm[:, None]
    return jnp.asarray(weights.T, dtype=dtype)  # (n_freqs, n_mels)
