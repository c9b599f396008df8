"""Fixed-shape random-crop batching for GAN training.

Replaces the reference's torch DataLoader + Collater
(/root/reference/harana/bin/train_fastsvc.py:438-557): per step, sample
`batch_size` utterances, take a frame-aligned random window of
`batch_length` samples from each, and emit one numpy batch dict with static
shapes. Unlike the reference, the sine excitation is NOT built here — the
jitted train step generates it on-device from the f0 window (train/gan.py).

Crops are driven by a seeded numpy Generator, so a run is reproducible and
(combined with per-host seeds) multi-host feeding stays deterministic.
"""

from __future__ import annotations

import logging
from typing import Dict, Iterator

import numpy as np


class FastSVCBatcher:
    """Infinite iterator of fixed-shape training batches."""

    def __init__(
        self,
        dataset,
        *,
        batch_size: int = 32,
        batch_length: int = 16000,
        hop_size: int = 160,
        aux_context_window: int = 0,
        use_spk_emb: bool = True,
        seed: int = 0,
        drop_short: bool = True,
    ):
        if batch_length % hop_size != 0:
            batch_length -= batch_length % hop_size
        self.dataset = dataset
        self.batch_size = batch_size
        self.batch_length = batch_length
        self.batch_frames = batch_length // hop_size
        self.hop_size = hop_size
        self.acw = aux_context_window
        self.use_spk_emb = use_spk_emb
        self.rng = np.random.default_rng(seed)

        # Pre-filter utterances long enough for one window (the reference
        # warns and skips inside the collater, train_fastsvc.py:522-527).
        self.valid_idx = []
        for i in range(len(dataset)):
            n_frames = self._ppg_len(i)
            if n_frames - 2 * self.acw > self.batch_frames:
                self.valid_idx.append(i)
            elif drop_short:
                logging.warning("utterance %d shorter than batch window; dropped", i)
        if not self.valid_idx:
            raise ValueError("no utterance long enough for the batch window")
        self._packed = None  # lazy vectorized store (see _pack)
        self._use_native = False

    def _pack(self):
        """Stack all valid utterances into padded contiguous arrays so a
        whole batch of random crops is four fancy-indexing gathers instead
        of a Python loop (the host loop was the training bottleneck once
        the device step dropped under 1 ms)."""
        items = []
        for idx in self.valid_idx:
            item = self.dataset[idx]
            if getattr(self.dataset, "return_utt_id", False):
                item = item[1:]
            items.append(item)
        n = len(items)
        max_frames = max(len(it[2]) for it in items)
        L = max_frames * self.hop_size
        ppg_dim = items[0][2].shape[-1]
        emb_dim = np.asarray(items[0][4]).reshape(-1).shape[0] if self.use_spk_emb else 0
        packed = {
            "audio": np.zeros((n, L), np.float32),
            "f0": np.zeros((n, max_frames), np.float32),
            "ppg": np.zeros((n, max_frames, ppg_dim), np.float32),
            "lft": np.zeros((n, L), np.float32),
            "n_frames": np.zeros((n,), np.int64),
        }
        if self.use_spk_emb:
            packed["spk_emb"] = np.zeros((n, emb_dim), np.float32)
        for i, (audio, f0, ppg, lft, emb) in enumerate(items):
            nf = len(ppg)
            packed["audio"][i, : nf * self.hop_size] = np.asarray(audio).reshape(-1)[: nf * self.hop_size]
            packed["f0"][i, :nf] = np.asarray(f0).reshape(-1)[:nf]
            packed["ppg"][i, :nf] = ppg[:nf]
            packed["lft"][i, : nf * self.hop_size] = np.asarray(lft).reshape(-1)[: nf * self.hop_size]
            packed["n_frames"][i] = nf
            if self.use_spk_emb:
                packed["spk_emb"][i] = np.asarray(emb, np.float32).reshape(-1)
        self._packed = packed
        from .native_batch import native_batch_available

        self._use_native = native_batch_available()

    def _ppg_len(self, idx: int) -> int:
        item = self.dataset[idx]
        ppg = item[3] if getattr(self.dataset, "return_utt_id", False) else item[2]
        return len(ppg)

    def sample_batch(self) -> Dict[str, np.ndarray]:
        if self.acw == 0:
            return self._sample_batch_vectorized()
        return self._sample_batch_loop()

    def _sample_batch_vectorized(self) -> Dict[str, np.ndarray]:
        if self._packed is None:
            self._pack()
        p = self._packed
        B, F, L = self.batch_size, self.batch_frames, self.batch_length
        rows = self.rng.integers(0, p["audio"].shape[0], size=B)
        max_start = p["n_frames"][rows] - F
        start = (self.rng.random(B) * (max_start - self.acw)).astype(np.int64) + self.acw
        if self._use_native:
            from .native_batch import assemble_batch

            out = assemble_batch(p, rows, start, F, self.hop_size)
            if self.use_spk_emb:
                out["spk_emb"] = p["spk_emb"][rows]
            return out
        s0 = start * self.hop_size
        # contiguous slice copies (memcpy) beat 2-D fancy-index gathers ~10x
        ppg_dim = p["ppg"].shape[-1]
        out = {
            "audio": np.empty((B, L, 1), np.float32),
            "f0": np.empty((B, F, 1), np.float32),
            "ppg": np.empty((B, F, ppg_dim), np.float32),
            "lft": np.empty((B, L, 1), np.float32),
        }
        for i in range(B):
            r, f0s, a0 = rows[i], start[i], s0[i]
            out["audio"][i, :, 0] = p["audio"][r, a0 : a0 + L]
            out["f0"][i, :, 0] = p["f0"][r, f0s : f0s + F]
            out["ppg"][i] = p["ppg"][r, f0s : f0s + F]
            out["lft"][i, :, 0] = p["lft"][r, a0 : a0 + L]
        if self.use_spk_emb:
            out["spk_emb"] = p["spk_emb"][rows]
        return out

    def _sample_batch_loop(self) -> Dict[str, np.ndarray]:
        B, F, L = self.batch_size, self.batch_frames, self.batch_length
        picks = self.rng.choice(self.valid_idx, size=B, replace=True)
        out = {
            "audio": np.empty((B, L, 1), np.float32),
            "f0": np.empty((B, F, 1), np.float32),
            "ppg": None,
            "lft": np.empty((B, L, 1), np.float32),
        }
        if self.use_spk_emb:
            out["spk_emb"] = None
        for bi, idx in enumerate(picks):
            item = self.dataset[idx]
            if getattr(self.dataset, "return_utt_id", False):
                item = item[1:]
            audio, f0, ppg, lft, emb = item
            n_frames = len(ppg)
            start = int(
                self.rng.integers(self.acw, n_frames - F - self.acw)
            )
            s0 = start * self.hop_size
            if out["ppg"] is None:
                out["ppg"] = np.empty((B, F + 2 * self.acw, ppg.shape[-1]), np.float32)
            out["audio"][bi, :, 0] = audio[s0 : s0 + L]
            out["f0"][bi, :, 0] = f0[start : start + F]
            out["ppg"][bi] = ppg[start - self.acw : start + self.acw + F]
            out["lft"][bi, :, 0] = lft[s0 : s0 + L]
            if self.use_spk_emb:
                e = np.asarray(emb, np.float32).reshape(-1)
                if out["spk_emb"] is None:
                    out["spk_emb"] = np.empty((B, e.shape[0]), np.float32)
                out["spk_emb"][bi] = e
        return out

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        while True:
            yield self.sample_batch()


class B02Batcher:
    """Fixed-shape variable-length batches for the B02 acoustic model.

    Replaces the reference sort+pad collater (train_b02.py:425-474). TPU
    needs static shapes, so every batch is padded/truncated to `max_frames`
    with a lengths vector; masking in the loss and the length-aware BLSTM
    make padding inert.
    """

    def __init__(self, dataset, *, batch_size: int = 16, max_frames: int = 400,
                 seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.max_frames = max_frames
        self.rng = np.random.default_rng(seed)

    def sample_batch(self):
        B, F = self.batch_size, self.max_frames
        picks = self.rng.choice(len(self.dataset), size=B, replace=True)
        first = self.dataset[picks[0]]
        off = 1 if getattr(self.dataset, "return_utt_id", False) else 0
        ppg_dim = first[2 + off].shape[-1]
        emb_dim = np.asarray(first[8 + off]).reshape(-1).shape[0]
        out_dim = first[6 + off].shape[-1] + first[7 + off].shape[-1]

        batch = {
            "ppg": np.zeros((B, F, ppg_dim), np.float32),
            "lft": np.zeros((B, F, 1), np.float32),
            "lf0": np.zeros((B, F, 1), np.float32),
            "spk_emb": np.zeros((B, emb_dim), np.float32),
            "targets": np.zeros((B, F, out_dim), np.float32),
            "lengths": np.zeros((B,), np.int32),
        }
        for bi, idx in enumerate(picks):
            item = self.dataset[idx]
            if off:
                item = item[1:]
            _, _, ppg, lft, lf0, _, mcep, bap, emb = item
            L = min(len(ppg), len(mcep), len(lf0), len(lft), F)
            batch["ppg"][bi, :L] = ppg[:L]
            batch["lft"][bi, :L] = np.asarray(lft).reshape(-1, 1)[:L]
            batch["lf0"][bi, :L] = np.asarray(lf0).reshape(-1, 1)[:L]
            batch["spk_emb"][bi] = np.asarray(emb, np.float32).reshape(-1)
            batch["targets"][bi, :L] = np.concatenate(
                [mcep[:L], bap[:L]], axis=-1
            )
            batch["lengths"][bi] = L
        return batch

    def __iter__(self):
        while True:
            yield self.sample_batch()
