"""B02 stage-3: apply fitted scalers (reference normalize_b02.py:119-164)."""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

from ..data.dataset import find_files
from ..data.hdf5 import read_hdf5, write_hdf5
from ..utils.scalers import load_scaler
from .common import setup_logging


def normalize_b02(dumpdir: str, outdir: str, stats_path: str):
    scalers = load_scaler(stats_path)
    os.makedirs(outdir, exist_ok=True)
    files = find_files(dumpdir)
    for f in files:
        out = os.path.join(outdir, os.path.basename(f))
        for name in ("wave", "f0", "vuv"):
            write_hdf5(out, name, read_hdf5(f, name))
        for name in ("ppg", "mcep", "bap"):
            write_hdf5(
                out, name,
                np.asarray(scalers[name].transform(read_hdf5(f, name)), np.float32),
            )
        for name in ("lf0", "lft"):
            arr = np.asarray(read_hdf5(f, name)).reshape(-1, 1)
            write_hdf5(
                out, name, np.asarray(scalers[name].transform(arr), np.float32)
            )
        emb = np.asarray(read_hdf5(f, "spk_emb")).reshape(1, -1)
        write_hdf5(
            out, "spk_emb",
            np.asarray(scalers["spk_emb"].transform(emb), np.float32),
        )
    logging.info("normalized %d utterances -> %s", len(files), outdir)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dumpdir", required=True)
    parser.add_argument("--outdir", required=True)
    parser.add_argument("--stats", required=True)
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args(argv)
    setup_logging(args.verbose)
    normalize_b02(args.dumpdir, args.outdir, args.stats)


if __name__ == "__main__":
    main()
