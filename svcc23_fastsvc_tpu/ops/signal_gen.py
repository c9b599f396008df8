"""NSF-style excitation signal generation, jittable.

Reference: SignalGenerator in /root/reference/harana/utils/features.py:111-213.
Frame-rate F0 is nearest-upsampled to sample rate; the sine is
vuv * sin(2π · cumsum(f0/fs)) * sine_amp with V/UV-gated Gaussian noise.

Differences from the reference implementation (not semantics): explicit JAX
PRNG keys instead of global torch RNG, channels-last (B, T, C) layout, and
the phase cumsum runs in float32 via jnp.cumsum (an associative scan XLA
lowers efficiently; 1 s × 16 kHz windows keep accumulated error negligible).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .resample import nearest_upsample


@dataclass(frozen=True)
class SignalGenerator:
    """Builds generator input excitation from frame-rate F0.

    Call with f0 of shape (B, T_frames, 1); returns (B, T_frames*hop, C)
    where C = len(signal_types).
    """

    sample_rate: int = 16000
    hop_size: int = 160
    sine_amp: float = 0.1
    noise_amp: float = 0.003
    signal_types: tuple = ("sine",)
    use_pallas: bool = False  # fused single-pass kernel (ops.pallas_kernels)

    def __post_init__(self):
        for t in self.signal_types:
            if t not in ("sine", "noise", "uv"):
                raise ValueError(f"unsupported signal type: {t}")

    def __call__(self, f0, key=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        outs = []
        for typ in self.signal_types:
            key, sub = jax.random.split(key)
            if typ == "noise":
                outs.append(self.random_noise(f0, sub))
            elif typ == "sine":
                outs.append(self.sinusoid(f0, sub))
            elif typ == "uv":
                outs.append(self.vuv_binary(f0))
        return jnp.concatenate(outs, axis=-1)

    def random_noise(self, f0, key):
        B, T, _ = f0.shape
        return jax.random.normal(key, (B, T * self.hop_size, 1), f0.dtype)

    def sinusoid(self, f0, key):
        B, T, _ = f0.shape
        vuv = nearest_upsample((f0 > 0).astype(f0.dtype), self.hop_size)
        if self.use_pallas:
            from .pallas_kernels import sine_excitation

            sine = sine_excitation(
                f0[:, :, 0], hop=self.hop_size, sr=self.sample_rate,
                amp=self.sine_amp,
            )[:, :, None]
        else:
            f0_up = nearest_upsample(f0, self.hop_size)
            radious = (f0_up / self.sample_rate) % 1.0
            phase = jnp.cumsum(radious, axis=1) * (2.0 * math.pi)
            sine = vuv * jnp.sin(phase) * self.sine_amp
        if self.noise_amp > 0:
            namp = vuv * self.noise_amp + (1.0 - vuv) * (self.noise_amp / 3.0)
            noise = jax.random.normal(key, sine.shape, sine.dtype) * namp
            sine = sine + noise
        return sine

    def vuv_binary(self, f0):
        return nearest_upsample((f0 > 0).astype(f0.dtype), self.hop_size)
