"""Utterance datasets over dumped HDF5 features.

Plain-Python (no torch DataLoader): the TPU input pipeline is a host-side
batcher (collate.py) that feeds fixed-shape numpy arrays straight into the
jitted step, so the dataset layer only needs indexed access + caching.

Same feature contract as the reference FastSVCDataset
(/root/reference/harana/datasets/audio_feats_dataset.py:22-121): per
utterance, (wave (T,), f0 (T',), ppg (T', C), lft (T,), spk_emb (1, S)).
"""

from __future__ import annotations

import fnmatch
import logging
import os
from typing import List, Optional

import numpy as np

from .hdf5 import read_hdf5


def find_files(root_dir: str, query: str = "*.h5", include_root_dir=True) -> List[str]:
    """Recursively collect files matching `query` under root_dir."""
    files = []
    for root, _, filenames in os.walk(root_dir, followlinks=True):
        for filename in fnmatch.filter(filenames, query):
            files.append(os.path.join(root, filename))
    if not include_root_dir:
        files = [f.replace(root_dir + "/", "") for f in files]
    return sorted(files)


def validate_length(xs, ys=None, hop_size: Optional[int] = None):
    """Trim a group of frame-rate xs (and sample-rate ys) to a common length
    (reference harana/utils/utils.py:32-61 semantics)."""
    min_len_x = min(len(x) for x in xs)
    if ys is not None:
        min_len_y = min(len(y) for y in ys)
        if min_len_y < min_len_x * hop_size:
            min_len_x = min_len_y // hop_size
        min_len_y = min_len_x * hop_size
        xs = [x[:min_len_x] for x in xs]
        ys = [y[:min_len_y] for y in ys]
        return xs + ys
    return [x[:min_len_x] for x in xs]


class FastSVCDataset:
    """Audio + features dataset over a dump directory of .h5 files."""

    FIELDS = ("wave", "f0", "ppg", "lft", "spk_emb")

    def __init__(
        self,
        root_dir: str,
        *,
        query: str = "*.h5",
        audio_length_threshold: Optional[int] = None,
        return_utt_id: bool = False,
        allow_cache: bool = True,
    ):
        files = find_files(root_dir, query)
        if not files:
            raise FileNotFoundError(f"no {query} files under {root_dir}")
        if audio_length_threshold is not None:
            lengths = [read_hdf5(f, "wave").shape[0] for f in files]
            kept = [f for f, l in zip(files, lengths) if l >= audio_length_threshold]
            if len(kept) != len(files):
                logging.warning(
                    "dropped %d/%d short utterances", len(files) - len(kept), len(files)
                )
            files = kept
        self.files = files
        self.utt_ids = [os.path.splitext(os.path.basename(f))[0] for f in files]
        self.return_utt_id = return_utt_id
        self.allow_cache = allow_cache
        self._cache = {} if allow_cache else None

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx: int):
        if self._cache is not None and idx in self._cache:
            return self._cache[idx]
        f = self.files[idx]
        items = tuple(np.asarray(read_hdf5(f, name)) for name in self.FIELDS)
        if self.return_utt_id:
            items = (self.utt_ids[idx],) + items
        if self._cache is not None:
            self._cache[idx] = items
        return items


class B02Dataset:
    """B02 acoustic-model dataset (reference audio_feats_dataset.py:124-232).

    Per-utterance fields: ppg (T', 256), lft (T', 1) frame-rate loudness,
    lf0 (T', 1) continuous log-F0, spk_emb, targets mcep (T', 60) ‖ bap
    (T', 3); wave/f0 kept for decode bookkeeping.
    """

    FIELDS = ("wave", "f0", "ppg", "lft", "lf0", "vuv", "mcep", "bap", "spk_emb")

    def __init__(self, root_dir: str, *, query: str = "*.h5",
                 return_utt_id: bool = False, allow_cache: bool = True):
        files = find_files(root_dir, query)
        if not files:
            raise FileNotFoundError(f"no {query} files under {root_dir}")
        self.files = files
        self.utt_ids = [os.path.splitext(os.path.basename(f))[0] for f in files]
        self.return_utt_id = return_utt_id
        self._cache = {} if allow_cache else None

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx: int):
        if self._cache is not None and idx in self._cache:
            return self._cache[idx]
        f = self.files[idx]
        items = tuple(np.asarray(read_hdf5(f, name)) for name in self.FIELDS)
        if self.return_utt_id:
            items = (self.utt_ids[idx],) + items
        if self._cache is not None:
            self._cache[idx] = items
        return items


class USFGANDataset:
    """Vocoder dataset over decoded/original h5 bundles
    (reference audio_feats_dataset.py:235-345): aux = mcep ‖ bap, plus the
    pitch-dependent dilation factors repeated to sample rate."""

    def __init__(self, root_dir: str, *, sample_rate: int = 24000,
                 hop_size: int = 160, dense_factor: int = 4,
                 query: str = "*.h5", return_utt_id: bool = False):
        from ..dsp.f0 import dilated_factor

        self._dilated_factor = dilated_factor
        files = find_files(root_dir, query)
        if not files:
            raise FileNotFoundError(f"no {query} files under {root_dir}")
        self.files = files
        self.utt_ids = [os.path.splitext(os.path.basename(f))[0] for f in files]
        self.sample_rate = sample_rate
        self.hop_size = hop_size
        self.dense_factor = dense_factor
        self.return_utt_id = return_utt_id

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx: int):
        f = self.files[idx]
        audio = np.asarray(read_hdf5(f, "wave")).reshape(-1)
        mcep = np.asarray(read_hdf5(f, "mcep"))
        bap = np.asarray(read_hdf5(f, "bap"))
        f0 = np.asarray(read_hdf5(f, "f0")).reshape(-1)
        aux = np.concatenate([mcep, bap], axis=1)
        f0_t, aux = validate_length([f0, aux])
        audio, f0_t = (lambda r: (r[1], r[0]))(
            validate_length([f0_t], [audio], self.hop_size)
        )
        df = self._dilated_factor(f0_t.copy(), self.sample_rate, self.dense_factor)
        df = np.repeat(df, self.hop_size, axis=0)
        items = (audio[: len(f0_t) * self.hop_size], aux, df, f0_t)
        if self.return_utt_id:
            items = (self.utt_ids[idx],) + items
        return items


class AudioSCPDataset:
    """wav.scp-driven audio dataset (reference scp_dataset.py:175-270 without
    the kaldiio dependency): yields (utt_id,) audio arrays in [-1, 1] and the
    file's sampling rate."""

    def __init__(self, wav_scp: str, *, return_utt_id: bool = False,
                 return_sampling_rate: bool = True):
        from ..bin.common import read_wav_scp

        self.entries = list(read_wav_scp(wav_scp).items())
        self.return_utt_id = return_utt_id
        self.return_sampling_rate = return_sampling_rate

    def __len__(self):
        return len(self.entries)

    def __getitem__(self, idx: int):
        from ..bin.common import read_wav

        utt_id, path = self.entries[idx]
        audio, sr = read_wav(path)
        item = (audio, sr) if self.return_sampling_rate else audio
        return (utt_id, item) if self.return_utt_id else item


class FeatsScpDataset:
    """feats.scp-driven feature dataset (reference MelSCPDataset,
    scp_dataset.py:273-345): each entry resolves through HDF5ScpLoader."""

    def __init__(self, feats_scp: str, *, default_hdf5_path: str = "feats",
                 return_utt_id: bool = False):
        from .hdf5 import HDF5ScpLoader

        self.loader = HDF5ScpLoader(feats_scp, default_hdf5_path)
        self.utt_ids = list(self.loader.keys())
        self.return_utt_id = return_utt_id

    def __len__(self):
        return len(self.utt_ids)

    def __getitem__(self, idx: int):
        utt_id = self.utt_ids[idx]
        feats = self.loader[utt_id]
        return (utt_id, feats) if self.return_utt_id else feats
