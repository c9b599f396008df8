#!/usr/bin/env python3
"""Reproduce the SVCC23 dataset layout from an NHSS-style corpus.

Equivalent of /root/reference/egs/generate_dataset/ (generate_svcctest.py +
shell glue): rename NHSS speakers to challenge ids, trim silence, resample
to the target rate, and carve the evaluation set listed in test_set.csv.

Usage:
  python generate_dataset.py --nhss-root /path/NHSS --outdir data \
      --test-csv test_set.csv --sr 24000
"""

import argparse
import csv
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)

# NHSS speaker id -> SVCC23 id (reference generate_svcctest.py:12-24).
# For the faithful challenge reproduction (song/speech selection, test-song
# exclusion, 1XXXX renumbering, timestamped test cuts) use generate_svcc.py.
SPEAKER_MAP = {
    "M04": "IDM1",
    "F01": "IDF1",
    "M03": "CDM1",
    "F02": "CDF1",
    "M02": "SM1",
    "F04": "SF1",
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nhss-root", required=True)
    p.add_argument("--outdir", default="data")
    p.add_argument("--test-csv", default=None)
    p.add_argument("--sr", type=int, default=24000)
    p.add_argument("--trim-top-db", type=float, default=60.0)
    args = p.parse_args()

    from svcc23_fastsvc_tpu.bin.common import read_wav, write_wav, resample
    from svcc23_fastsvc_tpu.dsp.trim import trim_silence

    test_utts = set()
    if args.test_csv and os.path.exists(args.test_csv):
        with open(args.test_csv) as f:
            for row in csv.reader(f):
                if row:
                    test_utts.add(row[0].strip())

    scp = {"train": [], "test": []}
    for nhss_spk, svcc_spk in SPEAKER_MAP.items():
        spk_dir = os.path.join(args.nhss_root, nhss_spk)
        if not os.path.isdir(spk_dir):
            continue
        for root, _, files in os.walk(spk_dir):
            for fn in sorted(files):
                if not fn.endswith(".wav"):
                    continue
                song = os.path.basename(root)
                utt = f"{svcc_spk}_{song}_{os.path.splitext(fn)[0]}"
                split = "test" if utt in test_utts else "train"
                out_dir = os.path.join(args.outdir, split, "wav")
                os.makedirs(out_dir, exist_ok=True)
                audio, sr = read_wav(os.path.join(root, fn))
                audio, _ = trim_silence(audio, top_db=args.trim_top_db)
                audio = resample(audio, sr, args.sr)
                out_path = os.path.join(out_dir, f"{utt}.wav")
                write_wav(out_path, audio, args.sr)
                scp[split].append(f"{utt} {os.path.abspath(out_path)}")

    for split, lines in scp.items():
        if not lines:
            continue
        d = os.path.join(args.outdir, split)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "wav.scp"), "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"{split}: {len(lines)} utterances")


if __name__ == "__main__":
    main()
