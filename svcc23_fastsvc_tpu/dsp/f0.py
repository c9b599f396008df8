"""F0 estimation + statistics, TPU-native.

The reference uses pyworld Harvest (C++ behind cython,
/root/reference/harana/bin/preprocess_fastsvc.py:41-57) — inherently serial
heuristic DSP. This module provides a *jittable* YIN-style estimator
(de Cheveigné & Kawahara 2002) instead: the difference function is computed
for all frames at once via batched FFT autocorrelation, so the whole F0 pass
for an utterance (or a batch of utterances) is one XLA program that
parallelizes over frames on the MXU/VPU. Accuracy is validated on synthetic
chirps/harmonic stacks (tests/test_f0.py); Harvest-exact parity is not a
goal — the training contract only needs a stable per-frame F0 in
[f0_floor, f0_ceil] with 0 = unvoiced, which downstream code (sine
excitation, F0 statistics, conversion) consumes identically.

F0Statistics / dilated_factor match the reference math
(/root/reference/harana/utils/features.py:24-108).
"""

from __future__ import annotations

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.stft import frame_signal


@partial(jax.jit, static_argnames=("sr", "hop", "frame_length", "f0_floor", "f0_ceil", "threshold"))
def yin_f0(
    x,
    *,
    sr: int = 16000,
    hop: int = 160,
    frame_length: int = 1024,
    f0_floor: float = 70.0,
    f0_ceil: float = 340.0,
    threshold: float = 0.15,
):
    """YIN F0 for a mono signal (T,) → (n_frames,) Hz with 0 = unvoiced.

    n_frames = T // hop + 1 (frames centered at k*hop, edge-padded), matching
    the frame count convention of WORLD's harvest at shiftms = hop/sr*1000.
    """
    T = x.shape[-1]
    n_frames = T // hop + 1
    W = frame_length // 2  # integration window
    tau_max = min(int(sr / f0_floor) + 1, W - 1)
    tau_min = max(int(sr / f0_ceil) - 1, 2)

    pad = frame_length // 2
    xp = jnp.pad(x, (pad, pad + n_frames * hop + frame_length - T))
    frames = frame_signal(xp, frame_length, hop)[:n_frames]  # (F, L)

    # difference function via autocorrelation:
    # d(tau) = r(0) + r_tau(0) - 2*ac(tau), ac via rfft of the full frame
    # restricted to the first W samples as in the original formulation.
    w = frames[:, :W]
    # cumulative energy of x[tau : tau+W]
    sq = jnp.square(frames)
    csum = jnp.cumsum(sq, axis=-1)
    zero = jnp.zeros_like(csum[:, :1])
    csum = jnp.concatenate([zero, csum], axis=-1)  # (F, L+1)
    e0 = csum[:, W] - csum[:, 0]  # r(0)
    taus = jnp.arange(tau_max + 1)
    e_tau = csum[:, taus + W] - csum[:, taus]  # (F, tau_max+1)

    n_fft = 1 << int(math.ceil(math.log2(frame_length + W)))
    fx = jnp.fft.rfft(frames, n_fft, axis=-1)
    fw = jnp.fft.rfft(w, n_fft, axis=-1)
    ac_full = jnp.fft.irfft(fx * jnp.conj(fw), n_fft, axis=-1)
    ac = ac_full[:, : tau_max + 1]  # (F, tau_max+1): sum_j x[j+tau] x[j]

    d = e0[:, None] + e_tau - 2.0 * ac
    d = jnp.maximum(d, 0.0)

    # cumulative-mean-normalized difference
    tau_idx = jnp.arange(1, tau_max + 1)
    cum = jnp.cumsum(d[:, 1:], axis=-1)
    cmndf = d[:, 1:] * tau_idx / jnp.maximum(cum, 1e-12)  # (F, tau_max)
    cmndf = jnp.concatenate([jnp.ones_like(d[:, :1]), cmndf], axis=-1)

    # mask out taus outside [tau_min, tau_max]
    valid = (taus >= tau_min) & (taus <= tau_max)
    cmndf_v = jnp.where(valid, cmndf, jnp.inf)

    # first tau under threshold that is a local minimum; fallback to argmin
    below = cmndf_v < threshold
    is_min = jnp.pad(
        (cmndf_v[:, 1:-1] <= cmndf_v[:, :-2])
        & (cmndf_v[:, 1:-1] <= cmndf_v[:, 2:]),
        ((0, 0), (1, 1)),
    )
    cand = below & is_min
    first_cand = jnp.argmax(cand, axis=-1)
    has_cand = jnp.any(cand, axis=-1)
    best = jnp.argmin(cmndf_v, axis=-1)
    tau_star = jnp.where(has_cand, first_cand, best)

    # parabolic interpolation around tau_star
    f_idx = jnp.arange(cmndf.shape[0])
    t0 = jnp.clip(tau_star - 1, 0, tau_max)
    t2 = jnp.clip(tau_star + 1, 0, tau_max)
    y0 = cmndf[f_idx, t0]
    y1 = cmndf[f_idx, tau_star]
    y2 = cmndf[f_idx, t2]
    denom = y0 + y2 - 2.0 * y1
    delta = jnp.where(
        jnp.abs(denom) > 1e-12, 0.5 * (y0 - y2) / denom, 0.0
    )
    delta = jnp.clip(delta, -1.0, 1.0)
    tau_ref = tau_star + delta

    f0 = sr / jnp.maximum(tau_ref, 1.0)
    dip = cmndf[f_idx, tau_star]
    voiced = (dip < threshold) & (f0 >= f0_floor) & (f0 <= f0_ceil)
    # also require some energy (silence gate)
    energy = e0 / W
    voiced &= energy > 1e-8
    return jnp.where(voiced, f0, 0.0)


class F0Statistics:
    """Log-F0 mean/std estimation + conversion.

    Same formulas as the reference (features.py:47-108): stats over nonzero
    frames; convert via exp((σt/σs)(log f0 − μs) + μt) on voiced frames.
    """

    def estimate(self, f0list):
        vals = np.concatenate(
            [np.log(np.asarray(f0)[np.asarray(f0) > 0]) for f0 in f0list]
        )
        return np.array([np.mean(vals), np.std(vals)])

    def convert(self, f0, orgf0stats, tarf0stats):
        f0 = np.asarray(f0, dtype=np.float64)
        cvf0 = np.zeros_like(f0)
        nz = f0 > 0
        cvf0[nz] = np.exp(
            (tarf0stats[1] / orgf0stats[1]) * (np.log(f0[nz]) - orgf0stats[0])
            + tarf0stats[0]
        )
        return cvf0


def dilated_factor(batch_f0, fs: int, dense_factor: int):
    """Pitch-dependent dilation factors (features.py:24-44)."""
    f0 = np.asarray(batch_f0, dtype=np.float64).copy()
    f0[f0 == 0] = fs / dense_factor
    factors = np.ones(f0.shape) * fs / f0 / dense_factor
    factors[factors <= 0] = 1
    return factors
