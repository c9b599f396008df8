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

import jax.numpy as jnp

from ..ops.stft import stft_magnitude


def stft_loss(x, y, fft_size: int, hop: int, win_length: int):
    """Single-resolution (sc_loss, mag_loss) on (B, T) signals."""
    x_mag = stft_magnitude(x, fft_size, hop, win_length)
    y_mag = stft_magnitude(y, fft_size, hop, win_length)
    sc = jnp.linalg.norm(y_mag - x_mag) / jnp.linalg.norm(y_mag)
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

    def __call__(self, x, y) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x, y: predicted/target signals (B, T) or (B, T, C)."""
        if x.ndim == 3:  # (B, T, C) -> (B*C, T)
            x = jnp.moveaxis(x, -1, 1).reshape(-1, x.shape[1])
            y = jnp.moveaxis(y, -1, 1).reshape(-1, y.shape[1])
        sc_total, mag_total = 0.0, 0.0
        for fft, hop, win in zip(self.fft_sizes, self.hop_sizes, self.win_lengths):
            sc, mag = stft_loss(x, y, fft, hop, win)
            sc_total += sc
            mag_total += mag
        n = len(self.fft_sizes)
        return sc_total / n, mag_total / n
