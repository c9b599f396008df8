"""Stage-3a: fit the PPG StandardScaler over the training dump.

Reference: /root/reference/harana/bin/compute_statistics_fastsvc.py:84-90 —
scale PPG only ("results degrade if F0 is scaled"), dump stats.joblib.
"""

from __future__ import annotations

import argparse
import logging

from ..data.dataset import FastSVCDataset
from ..utils.scalers import StandardScaler, save_scaler
from .common import setup_logging


def compute_statistics(dumpdir: str, out_path: str):
    ds = FastSVCDataset(dumpdir, allow_cache=False)
    scaler = StandardScaler()
    for i in range(len(ds)):
        _, _, ppg, _, _ = ds[i]
        scaler.partial_fit(ppg)
    save_scaler(scaler, out_path)
    logging.info("fitted scaler over %d utterances -> %s", len(ds), out_path)
    return scaler


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dumpdir", required=True)
    parser.add_argument("--dumpfile", required=True, help="output stats.joblib")
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args()
    setup_logging(args.verbose)
    compute_statistics(args.dumpdir, args.dumpfile)


if __name__ == "__main__":
    main()
