"""Objective evaluation: mel L1 and MCD between two wav sets.

The driver's quality metric surface ("mel L1 vs reference"). Pairs files by
utterance id (basename prefix match) and reports per-pair and aggregate
values (mel_l1_mean, mcd_mean in dB) as one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

import jax.numpy as jnp

from ..utils.metrics import mel_l1, wav_mcd
from .common import read_wav, resample, setup_logging


def evaluate_dirs(ref_dir: str, hyp_dir: str, *, sr: int = 16000):
    refs = {
        os.path.splitext(f)[0]: os.path.join(ref_dir, f)
        for f in os.listdir(ref_dir) if f.endswith(".wav")
    }
    results = {}
    mcds = {}
    for f in sorted(os.listdir(hyp_dir)):
        if not f.endswith(".wav"):
            continue
        stem = os.path.splitext(f)[0]
        match = None
        for rstem in refs:
            if stem == rstem or stem.startswith(rstem) or rstem.startswith(stem):
                match = rstem
                break
        if match is None:
            continue
        ra, rsr = read_wav(refs[match])
        ha, hsr = read_wav(os.path.join(hyp_dir, f))
        ra = resample(ra, rsr, sr)
        ha = resample(ha, hsr, sr)
        xa = jnp.asarray(ra, jnp.float32)
        xb = jnp.asarray(ha, jnp.float32)
        results[stem] = float(mel_l1(xa, xb, sr=sr))
        mcds[stem] = float(wav_mcd(xa, xb, sr=sr))
    agg = float(np.mean(list(results.values()))) if results else float("nan")
    agg_mcd = float(np.mean(list(mcds.values()))) if mcds else float("nan")
    return {
        "mel_l1_mean": agg,
        "mcd_mean": agg_mcd,
        "n_pairs": len(results),
        "per_utt": results,
        "per_utt_mcd": mcds,
    }


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--ref-dir", required=True)
    parser.add_argument("--hyp-dir", required=True)
    parser.add_argument("--sr", type=int, default=16000)
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args(argv)
    setup_logging(args.verbose)
    out = evaluate_dirs(args.ref_dir, args.hyp_dir, sr=args.sr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
