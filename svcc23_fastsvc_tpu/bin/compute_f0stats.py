"""Stage-2: per-speaker log-F0 statistics.

Reference: /root/reference/harana/bin/compute_f0stats.py:109-131 — collect
voiced F0 frames per speaker over the training dump, write
f0_stats/<spk>.yml with log-F0 mean/std (decode uses mean-only shift).
"""

from __future__ import annotations

import argparse
import logging
import os
from collections import defaultdict

import numpy as np
import yaml

from ..data.dataset import FastSVCDataset
from ..dsp.f0 import F0Statistics
from .common import setup_logging, utt_speaker


def compute_f0stats(dumpdir: str, outdir: str):
    ds = FastSVCDataset(dumpdir, return_utt_id=True, allow_cache=False)
    per_spk = defaultdict(list)
    for i in range(len(ds)):
        utt_id, _, f0, _, _, _ = ds[i]
        per_spk[utt_speaker(utt_id)].append(np.asarray(f0))
    os.makedirs(outdir, exist_ok=True)
    stats = F0Statistics()
    out = {}
    for spk, f0list in per_spk.items():
        mean, std = stats.estimate(f0list)
        out[spk] = {"f0_mean": float(mean), "f0_std": float(std)}
        with open(os.path.join(outdir, f"{spk}.yml"), "w") as f:
            yaml.safe_dump(out[spk], f)
    logging.info("wrote f0 stats for %d speakers -> %s", len(out), outdir)
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dumpdir", required=True)
    parser.add_argument("--outdir", required=True)
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args()
    setup_logging(args.verbose)
    compute_f0stats(args.dumpdir, args.outdir)


if __name__ == "__main__":
    main()
