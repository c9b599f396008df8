"""Host->device transfer wire format for training batches.

Motivation (measured, docs/PERF_r05.md §6): on a remote-tunnel TPU backend
the host->device link sustains ~36-40 MB/s, while the FastSVC train batch
is ~9 MB/step f32 (batch 32 x 1 s @ 24 kHz: wave 3.07 + lft 3.07 + ppg
2.76 MB) — the CLI train loop becomes transfer-bound at ~250 ms/step
against a 97.7 ms/step device program. The reference never faces this (its
DataLoader feeds a local CUDA device over PCIe,
/root/reference/harana/bin/train_fastsvc.py:678-697), but a TPU-native
framework that feeds remote accelerators should treat the wire like the
production a2a links it is: ship the information, not the padding.

The packed format is EXACT for the production pipeline, not a lossy
compression:

* ``audio`` f32 -> int16. Source wavs are 16-bit PCM decoded as
  ``x = k / 32768`` (reference scp_dataset.py:150 and our datasets), so
  every sample is exactly representable and the round-trip is bit-exact.
  For non-PCM-derived floats the quantization is <= 2**-16 and the packer
  logs the measured round-trip error once.
* ``ppg`` f32 -> bfloat16. Only valid when the step runs with
  ``compute_dtype=bfloat16``: the task casts ppg to bf16 before first use
  (train/gan.py _cast), so quantize-at-transfer produces the identical
  bf16 values the step would compute anyway. The Trainer refuses to pack
  for f32-compute configs.
* ``lft`` f32 -> frame rate. The preprocess pipeline stores loudness
  upsampled sample-rate by nearest repetition (reference
  preprocess_fastsvc.py:60-75, Stretch2d(hop, 1)), so within a
  frame-aligned crop ``lft == repeat(lft[::hop], hop)`` holds exactly.
  The packer verifies this invariant on the first batch; if it does not
  hold (non-pipeline data), it falls back to full-rate bf16 (same
  bf16-compute exactness argument as ppg) and logs the fallback.
* ``f0`` / ``spk_emb`` are tiny and stay f32.

Unpacking runs INSIDE the jitted step (train/gan.py calls
``unpack_batch`` first) and is idempotent: an unpacked f32 batch passes
through untouched, so eval/dump paths need no flag plumbing.
"""

from __future__ import annotations

import logging

import numpy as np

try:  # ml_dtypes ships with jax; bf16 as a numpy dtype
    import ml_dtypes

    _BF16 = np.dtype(ml_dtypes.bfloat16)
except Exception:  # pragma: no cover - ml_dtypes is a jax dependency
    _BF16 = None


def _is_hop_constant(lft: np.ndarray, hop: int) -> bool:
    """True iff the time axis (-2) is constant within every hop window."""
    t = lft.shape[-2]
    if t % hop:
        return False
    shaped = lft.reshape(*lft.shape[:-2], t // hop, hop, lft.shape[-1])
    return bool(np.all(shaped == shaped[..., :1, :]))


class WirePacker:
    """Callable packing host batches (numpy) into the transfer format.

    Works on plain ``(B, T, C)`` batches and on stacked ``(K, B, T, C)``
    multi-step batches (time axis is -2 throughout). Decisions that need
    data inspection (lft hop-constancy, audio PCM-exactness) are made on
    the first batch and logged, then reused.
    """

    def __init__(self, *, hop_size: int):
        if _BF16 is None:
            raise RuntimeError("wire packing requires ml_dtypes (bfloat16)")
        self.hop_size = int(hop_size)
        self._lft_frame: bool | None = None
        self._audio_checked = False

    def __call__(self, batch: dict) -> dict:
        out = dict(batch)
        audio = out.get("audio")
        if audio is not None and audio.dtype == np.float32:
            q = np.clip(np.round(audio * 32768.0), -32768, 32767)
            if not self._audio_checked:
                err = float(np.abs(q / 32768.0 - audio).max())
                logging.info(
                    "wire: audio f32->int16, first-batch round-trip "
                    "maxdiff %.2e%s", err,
                    " (exact: PCM16-derived)" if err == 0.0 else "",
                )
                self._audio_checked = True
            out["audio"] = q.astype(np.int16)
        lft = out.get("lft")
        if lft is not None and lft.dtype == np.float32 and audio is not None:
            if self._lft_frame is None:
                self._lft_frame = _is_hop_constant(
                    np.asarray(lft), self.hop_size
                )
                logging.info(
                    "wire: lft %s", "frame-rate f32 (hop-constant)"
                    if self._lft_frame else
                    "NOT hop-constant -> full-rate bf16 fallback",
                )
            if self._lft_frame:
                out["lft"] = np.ascontiguousarray(
                    lft[..., :: self.hop_size, :]
                )
            else:
                out["lft"] = lft.astype(_BF16)
        ppg = out.get("ppg")
        if ppg is not None and ppg.dtype == np.float32:
            out["ppg"] = ppg.astype(_BF16)
        return out


def unpack_batch(batch: dict, *, hop_size: int) -> dict:
    """Invert :class:`WirePacker` inside a jitted step (jnp ops, traced).

    Idempotent: already-f32 batches pass through unchanged, so every step
    function can call this unconditionally.
    """
    import jax.numpy as jnp

    out = dict(batch)
    audio = out.get("audio")
    if audio is not None and audio.dtype == jnp.int16:
        audio = audio.astype(jnp.float32) / 32768.0
        out["audio"] = audio
    lft = out.get("lft")
    if (
        lft is not None
        and audio is not None
        and lft.shape[-2] != audio.shape[-2]
    ):
        if lft.shape[-2] * hop_size != audio.shape[-2]:
            raise ValueError(
                f"wire: lft frames {lft.shape[-2]} x hop {hop_size} != "
                f"audio samples {audio.shape[-2]}"
            )
        out["lft"] = jnp.repeat(lft, hop_size, axis=-2)
    return out
