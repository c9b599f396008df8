"""Multi-resolution STFT loss.

Same math as the reference (/root/reference/harana/losses/stft_loss.py):
per-resolution spectral-convergence (Frobenius-relative) + log-magnitude L1,
averaged over resolutions. All resolutions are evaluated inside one traced
function; XLA fuses framing + rfft per resolution, so the whole loss is one
device program (the reference launches 12 cuFFT plans per step).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.stft import stft_magnitude


def stft_loss(x, y, fft_size: int, hop: int, win_length: int,
              axis_name=None):
    """Single-resolution (sc_loss, mag_loss) on (B, T) signals.

    The spectral-convergence term is a batch-GLOBAL Frobenius ratio
    (reference stft_loss.py SpectralConvergenceLoss) — nonlinear in the
    batch axis, so under shard_map DP the squared norms are psum'd over
    `axis_name` before the ratio to keep the exact reference semantics
    (per-shard ratios averaged would differ at the 1e-3 level). The mag
    term is a plain mean and needs no special handling here (the caller
    pmeans metrics/grads).
    """
    x_mag = stft_magnitude(x, fft_size, hop, win_length)
    y_mag = stft_magnitude(y, fft_size, hop, win_length)
    diff_sq = jnp.sum(jnp.square(y_mag - x_mag))
    ref_sq = jnp.sum(jnp.square(y_mag))
    if axis_name is not None:
        diff_sq = jax.lax.psum(diff_sq, axis_name)
        ref_sq = jax.lax.psum(ref_sq, axis_name)
    sc = jnp.sqrt(diff_sq) / jnp.sqrt(ref_sq)
    mag = jnp.mean(jnp.abs(jnp.log(y_mag) - jnp.log(x_mag)))
    return sc, mag


@dataclass(frozen=True)
class MultiResolutionSTFTLoss:
    """Default FastSVC config: 6 resolutions (conf/fastsvc.yaml:57-61)."""

    fft_sizes: Sequence[int] = (2048, 1024, 512, 256, 128, 64)
    hop_sizes: Sequence[int] = (512, 256, 128, 64, 32, 16)
    win_lengths: Sequence[int] = (2048, 1024, 512, 256, 128, 64)

    def __post_init__(self):
        assert len(self.fft_sizes) == len(self.hop_sizes) == len(self.win_lengths)

    def __call__(self, x, y, axis_name=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x, y: predicted/target signals (B, T) or (B, T, C).

        axis_name: shard_map data axis for the batch-global spectral-
        convergence norms (see stft_loss); None outside shard_map."""
        if x.ndim == 3:  # (B, T, C) -> (B*C, T)
            x = jnp.moveaxis(x, -1, 1).reshape(-1, x.shape[1])
            y = jnp.moveaxis(y, -1, 1).reshape(-1, y.shape[1])
        sc_total, mag_total = 0.0, 0.0
        for fft, hop, win in zip(self.fft_sizes, self.hop_sizes, self.win_lengths):
            sc, mag = stft_loss(x, y, fft, hop, win, axis_name=axis_name)
            sc_total += sc
            mag_total += mag
        n = len(self.fft_sizes)
        return sc_total / n, mag_total / n
