"""B02 stage-2: fit scalers (reference compute_statistics_b02.py:89-104:
MinMax for ppg/lf0/lft/spk_emb, Standard for mcep/bap)."""

from __future__ import annotations

import argparse
import logging

import numpy as np

from ..data.dataset import B02Dataset
from ..utils.scalers import MinMaxScaler, StandardScaler, save_scaler
from .common import setup_logging


def compute_statistics_b02(dumpdir: str, out_path: str):
    ds = B02Dataset(dumpdir, allow_cache=False)
    scalers = {
        "ppg": MinMaxScaler(),
        "lf0": MinMaxScaler(),
        "lft": MinMaxScaler(),
        "spk_emb": MinMaxScaler(),
        "mcep": StandardScaler(),
        "bap": StandardScaler(),
    }
    for i in range(len(ds)):
        _, _, ppg, lft, lf0, _, mcep, bap, emb = ds[i]
        scalers["ppg"].partial_fit(ppg)
        scalers["lf0"].partial_fit(np.asarray(lf0).reshape(-1, 1))
        scalers["lft"].partial_fit(np.asarray(lft).reshape(-1, 1))
        scalers["spk_emb"].partial_fit(np.asarray(emb).reshape(1, -1))
        scalers["mcep"].partial_fit(mcep)
        scalers["bap"].partial_fit(bap)
    save_scaler(scalers, out_path)
    logging.info("fitted B02 scalers over %d utterances -> %s", len(ds), out_path)
    return scalers


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dumpdir", required=True)
    parser.add_argument("--dumpfile", required=True)
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args(argv)
    setup_logging(args.verbose)
    compute_statistics_b02(args.dumpdir, args.dumpfile)


if __name__ == "__main__":
    main()
