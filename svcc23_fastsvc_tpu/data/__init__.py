"""Data pipeline: HDF5 utterance store, datasets, fixed-shape batching."""

from .hdf5 import read_hdf5, write_hdf5, HDF5ScpLoader  # noqa: F401
from .dataset import FastSVCDataset, find_files, validate_length  # noqa: F401
from .collate import FastSVCBatcher  # noqa: F401
from .prefetch import PrefetchIterator  # noqa: F401
