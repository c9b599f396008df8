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


def continuous_f0(f0):
    """Continuous-F0 track: linear interpolation through unvoiced regions.

    f0: (B, T, 1) with 0 marking unvoiced frames. Leading/trailing unvoiced
    runs take the nearest voiced value; an all-unvoiced track stays 0.
    Jittable (static shapes, cummax/cummin scans — no data-dependent
    control flow), replacing the reference's scipy interp1d "slinear"
    continuous-F0 construction (preprocess_b02.py:49-105).
    """
    x = f0[..., 0]
    B, T = x.shape
    voiced = x > 0
    idx = jnp.arange(T)[None, :]
    prev = jax.lax.cummax(jnp.where(voiced, idx, -1), axis=1)
    nxt = jnp.flip(
        jax.lax.cummin(jnp.flip(jnp.where(voiced, idx, T), axis=1), axis=1),
        axis=1,
    )
    vp = jnp.take_along_axis(x, jnp.clip(prev, 0, T - 1), axis=1)
    vn = jnp.take_along_axis(x, jnp.clip(nxt, 0, T - 1), axis=1)
    has_prev, has_next = prev >= 0, nxt <= T - 1
    denom = jnp.maximum(nxt - prev, 1).astype(x.dtype)
    w = (idx - prev).astype(x.dtype) / denom
    interp = vp + (vn - vp) * w
    cf0 = jnp.where(
        has_prev & has_next, interp,
        jnp.where(has_prev, vp, jnp.where(has_next, vn, 0.0)),
    )
    return jnp.where(voiced, x, cf0)[..., None]


@dataclass(frozen=True)
class SignalGenerator:
    """Builds generator input excitation from frame-rate F0.

    Call with f0 of shape (B, T_frames, 1); returns (B, T_frames*hop, C)
    where C = len(signal_types).

    sine_f0_type: "f0" (reference default) gates the sine by V/UV; "contf0"
    (config surface conf/fastsvc.yaml:79 / taco2_hubertsoft.yaml:62) drives
    an ungated NSF sine from the continuous-F0 track (usfgan-style
    excitation; V/UV still shapes the noise floor and the "uv" channel).
    """

    sample_rate: int = 16000
    hop_size: int = 160
    sine_amp: float = 0.1
    noise_amp: float = 0.003
    signal_types: tuple = ("sine",)
    sine_f0_type: str = "f0"
    # fused single-pass Mosaic kernel (ops.pallas_kernels). None = auto:
    # enabled on TPU devices, off elsewhere (the kernel needs Mosaic;
    # CPU tests exercise it via interpret mode directly). Chip-validated
    # vs the XLA formula: max |diff| 3.7e-5, ~2.1x faster at bench shapes
    # (B32 x 150 frames x hop 160 on v5e: 70 us vs 150 us per call).
    use_pallas: "bool | None" = None

    def __post_init__(self):
        for t in self.signal_types:
            if t not in ("sine", "noise", "uv"):
                raise ValueError(f"unsupported signal type: {t}")
        if self.sine_f0_type not in ("f0", "contf0"):
            raise ValueError(f"unsupported sine_f0_type: {self.sine_f0_type}")

    def _pallas_enabled(self) -> bool:
        if self.use_pallas is not None:
            return self.use_pallas
        try:
            return jax.devices()[0].device_kind.startswith("TPU")
        except Exception:
            return False

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
        src_f0 = continuous_f0(f0) if self.sine_f0_type == "contf0" else f0
        gate = 1.0 if self.sine_f0_type == "contf0" else vuv
        if self._pallas_enabled():
            from .pallas_kernels import sine_excitation

            # the kernel gates by f0>0 internally: idempotent with the vuv
            # gate for "f0", and a no-op on the strictly-positive contf0
            sine = sine_excitation(
                src_f0[:, :, 0], hop=self.hop_size, sr=self.sample_rate,
                amp=self.sine_amp,
            )[:, :, None]
        else:
            f0_up = nearest_upsample(src_f0, self.hop_size)
            radious = (f0_up / self.sample_rate) % 1.0
            phase = jnp.cumsum(radious, axis=1) * (2.0 * math.pi)
            sine = gate * jnp.sin(phase) * self.sine_amp
        if self.noise_amp > 0:
            namp = vuv * self.noise_amp + (1.0 - vuv) * (self.noise_amp / 3.0)
            noise = jax.random.normal(key, sine.shape, sine.dtype) * namp
            sine = sine + noise
        return sine

    def vuv_binary(self, f0):
        return nearest_upsample((f0 > 0).astype(f0.dtype), self.hop_size)
