#!/usr/bin/env python3
"""Reproduce the SVCC 2023 challenge dataset from the NHSS corpus.

Faithful single-driver equivalent of the reference generation pipeline
(/root/reference/egs/generate_dataset/: generate_svcc.sh +
generate_svcctest.py + resample.py + remove_silences.py):

  1. training set — for each training speaker, drop the test songs
     (S05/S06/S09/S15), keep Song recordings for the in-domain speakers
     (M04/F01) and Speech recordings for the cross-domain speakers
     (M03/F02), renumber sequentially as 1XXXX.wav under the SVCC speaker
     id, and derive 1XXXX.txt transcripts from the NHSS .lab files
     (non-<SIL> labels joined by spaces);
  2. test set — cut [start, stop] second windows from each speaker's full
     song.wav mixes per test_set.csv rows, writing 3XXXX.wav into
     evaluation/ (SM1/SF1) or ground_truth/ (the training speakers);
  3. resample the training speaker dirs 48 kHz -> 24 kHz and trim
     leading/trailing silence (top_db=30), matching the reference's
     post-processing scope (evaluation/ground_truth wavs are left raw).

Usage:
  python generate_svcc.py --nhss-root /path/to/NHSS/Data --outdir SVCC23 \
      [--test-csv test_set.csv] [--sr 24000]

The NHSS layout expected: {root}/{spk}/{Sxx}/{Song,Speech}/*.wav (+ .lab),
plus {root}/{spk}/{Sxx}/song.wav full mixes used for the test cuts.
"""

import argparse
import csv
import glob
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)

# NHSS speaker -> SVCC23 id (reference generate_svcctest.py:12-24)
CHANGE_ID = {
    "M04": "IDM1",
    "F01": "IDF1",
    "M03": "CDM1",
    "F02": "CDF1",
    "M02": "SM1",
    "F04": "SF1",
}
# training speakers and which recording style each contributes
# (generate_svcc.sh:10,30-34)
TRAIN_STYLE = {"M04": "Song", "F01": "Song", "M03": "Speech", "F02": "Speech"}
TEST_SONGS = {"S05", "S06", "S09", "S15"}  # generate_svcc.sh:22-25


def lab_to_text(lab_path):
    """NHSS .lab -> transcript: third column of non-<SIL> lines, joined
    (generate_svcc.sh awk '!/<SIL>/{print $3}')."""
    words = []
    with open(lab_path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 3 and "<SIL>" not in line:
                words.append(parts[2])
    return " ".join(words)


def generate_training_set(nhss_root, outdir):
    from svcc23_fastsvc_tpu.bin.common import read_wav, write_wav

    for spk, style in TRAIN_STYLE.items():
        spk_dir = os.path.join(nhss_root, spk)
        if not os.path.isdir(spk_dir):
            print(f"warning: {spk_dir} missing; skipping {spk}")
            continue
        svcc = CHANGE_ID[spk]
        out_spk = os.path.join(outdir, svcc)
        os.makedirs(out_spk, exist_ok=True)
        wavs = sorted(
            glob.glob(os.path.join(spk_dir, "S*", style, "*.wav"))
        )
        wavs = [w for w in wavs
                if os.path.basename(os.path.dirname(os.path.dirname(w)))
                not in TEST_SONGS]
        idx = 1
        for wav in wavs:
            utt = f"1{idx:04d}"
            audio, sr = read_wav(wav)
            write_wav(os.path.join(out_spk, f"{utt}.wav"), audio, sr)
            lab = wav[: -len("wav")] + "lab"
            if os.path.exists(lab):
                with open(os.path.join(out_spk, f"{utt}.txt"), "w") as f:
                    f.write(lab_to_text(lab) + "\n")
            idx += 1
        print(f"{svcc}: {idx - 1} training utterances ({style})")


def generate_test_set(nhss_root, outdir, test_csv):
    from svcc23_fastsvc_tpu.bin.common import read_wav, write_wav

    with open(test_csv) as f:
        rows = [r for r in csv.DictReader(f) if r.get("id")]
    n = 0
    song_cache = {}
    for row in rows:
        spk, song = row["id"].split("_")[0], row["id"].split("_")[1]
        src = os.path.join(nhss_root, spk, song, "song.wav")
        if src not in song_cache:
            if not os.path.exists(src):
                print(f"warning: {src} missing; skipping")
                song_cache[src] = None
            else:
                song_cache[src] = read_wav(src)
        if song_cache[src] is None:
            continue
        audio, sr = song_cache[src]
        lo = int(float(row["start"]) * sr)
        hi = int(float(row["stop"]) * sr)
        new_spk = CHANGE_ID[spk]
        split = "evaluation" if new_spk in ("SM1", "SF1") else "ground_truth"
        out_dir = os.path.join(outdir, split, new_spk)
        os.makedirs(out_dir, exist_ok=True)
        name = f"3{str(row['idx']).zfill(4)}.wav"
        write_wav(os.path.join(out_dir, name), audio[lo:hi], sr)
        n += 1
    print(f"test set: {n} cuts")


def postprocess_training_dirs(outdir, sr_target, top_db):
    """Resample + silence-trim the top-level speaker dirs only (the
    reference glob {outdir}/*/*.wav does not reach evaluation/ground_truth
    one level deeper)."""
    from svcc23_fastsvc_tpu.bin.common import read_wav, write_wav, resample
    from svcc23_fastsvc_tpu.dsp.trim import trim_silence

    for wav in sorted(glob.glob(os.path.join(outdir, "*", "*.wav"))):
        audio, sr = read_wav(wav)
        if sr != sr_target:
            audio = resample(audio, sr, sr_target)
        audio, _ = trim_silence(
            audio, top_db=top_db, frame_length=2048, hop_length=512
        )
        write_wav(wav, audio, sr_target)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nhss-root", required=True, help="NHSS Data directory")
    p.add_argument("--outdir", default="SVCC23")
    p.add_argument("--test-csv",
                   default=os.path.join(os.path.dirname(__file__),
                                        "test_set.csv"))
    p.add_argument("--sr", type=int, default=24000)
    p.add_argument("--trim-top-db", type=float, default=30.0,
                   help="reference remove_silences.py threshold")
    args = p.parse_args()

    os.makedirs(args.outdir, exist_ok=True)
    generate_training_set(args.nhss_root, args.outdir)
    if os.path.exists(args.test_csv):
        generate_test_set(args.nhss_root, args.outdir, args.test_csv)
    else:
        print(f"test csv {args.test_csv} not found; skipping test carving")
    postprocess_training_dirs(args.outdir, args.sr, args.trim_top_db)
    print("done.")


if __name__ == "__main__":
    main()
