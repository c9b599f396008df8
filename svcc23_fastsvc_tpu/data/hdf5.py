"""HDF5 utterance store with Kaldi-scp addressing.

Same on-disk contract as the reference
(/root/reference/harana/utils/utils.py:86-240): one .h5 per utterance with
named datasets (wave, f0, ppg, lft, spk_emb; B02 adds lf0, vuv, mcep, bap),
and scp files whose entries may carry dataset paths as
``utt path.h5:dset[,dset2]``.
"""

from __future__ import annotations

import os

import h5py
import numpy as np


def read_hdf5(path: str, dataset_name: str):
    """Read one dataset from an hdf5 file."""
    if not os.path.exists(path):
        raise FileNotFoundError(f"no such hdf5 file: {path}")
    with h5py.File(path, "r") as f:
        if dataset_name not in f:
            raise KeyError(f"dataset {dataset_name!r} not in {path}")
        return f[dataset_name][()]


def write_hdf5(path: str, dataset_name: str, data, *, overwrite: bool = True):
    """Write one dataset into an hdf5 file (creating dirs as needed)."""
    data = np.asarray(data)
    dirname = os.path.dirname(path)
    if dirname and not os.path.exists(dirname):
        os.makedirs(dirname, exist_ok=True)
    with h5py.File(path, "a") as f:
        if dataset_name in f:
            if not overwrite:
                raise KeyError(
                    f"dataset {dataset_name!r} already exists in {path}"
                )
            del f[dataset_name]
        f.create_dataset(dataset_name, data=data)


class HDF5ScpLoader:
    """Loader for kaldi-style scp files pointing at hdf5 members.

    Entry forms (reference utils.py:159-240):
        utt_a  /path/a.h5            (uses `default_hdf5_path`)
        utt_b  /path/b.h5:feats
        utt_c  /path/c.h5:feats_1,feats_2   (returns a concatenated pair)
    """

    def __init__(self, feats_scp: str, default_hdf5_path: str = "feats"):
        self.default_hdf5_path = default_hdf5_path
        self.data = {}
        with open(feats_scp) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                key, value = line.split(maxsplit=1)
                self.data[key] = value

    def keys(self):
        return self.data.keys()

    def values(self):
        for key in self.data:
            yield self[key]

    def __len__(self):
        return len(self.data)

    def __iter__(self):
        return iter(self.data)

    def __contains__(self, key):
        return key in self.data

    def __getitem__(self, key):
        p = self.data[key]
        if ":" in p:
            path, dset = p.split(":", 1)
            if "," in dset:
                return np.concatenate(
                    [read_hdf5(path, d) for d in dset.split(",")], axis=-1
                )
            return read_hdf5(path, dset)
        return read_hdf5(p, self.default_hdf5_path)
