"""Data pipeline: HDF5 utterance store, datasets, fixed-shape batching."""

from .hdf5 import read_hdf5, write_hdf5, HDF5ScpLoader  # noqa: F401
from .dataset import (  # noqa: F401
    AudioSCPDataset,
    B02Dataset,
    FastSVCDataset,
    FeatsScpDataset,
    USFGANDataset,
    find_files,
    validate_length,
)
from .collate import FastSVCBatcher  # noqa: F401
from .prefetch import PrefetchIterator  # noqa: F401
