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
