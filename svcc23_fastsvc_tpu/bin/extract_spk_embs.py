"""Stage-0: per-speaker x-vector embeddings → one spk_embs.h5.

Reference: /root/reference/harana/bin/extract_spk_embs.py:90-142 — runs the
frozen SpeechBrain spkrec-xvect-voxceleb encoder per utterance at 16 kHz and
stores the per-speaker AVERAGE embedding keyed by speaker id. Embeddings are
fixed (not learnable) conditioning constants (reference README.md:30).

Modes:
  xvector : JAX x-vector (TDNN) forward from a converted checkpoint
            (models/xvector.py)
  ingest  : average precomputed per-utterance embeddings from an hdf5/npz
  hash    : deterministic pseudo-embeddings seeded by speaker id — for
            smoke tests / recipes without the external checkpoint; NOT for
            real conversion quality.
"""

from __future__ import annotations

import argparse
import hashlib
import logging
from collections import defaultdict

import numpy as np

from ..data.hdf5 import read_hdf5, write_hdf5
from .common import iter_wav_scp, resample, setup_logging, utt_speaker


def hash_embedding(spk: str, dim: int = 512) -> np.ndarray:
    seed = int.from_bytes(hashlib.sha256(spk.encode()).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim)
    return (v / np.linalg.norm(v)).astype(np.float32)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--wav-scp", required=True)
    parser.add_argument("--out-file", required=True, help="output spk_embs.h5")
    parser.add_argument("--mode", default="hash", choices=["xvector", "ingest", "hash"])
    parser.add_argument("--checkpoint", default=None, help="x-vector weights")
    parser.add_argument("--embeddings-file", default=None,
                        help="ingest: h5 with per-utterance embeddings")
    parser.add_argument("--dim", type=int, default=512)
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args(argv)
    setup_logging(args.verbose)

    per_spk = defaultdict(list)
    if args.mode == "hash":
        from .common import read_wav_scp

        for utt in read_wav_scp(args.wav_scp):
            spk = utt_speaker(utt)
            per_spk.setdefault(spk, [hash_embedding(spk, args.dim)])
    elif args.mode == "ingest":
        from .common import read_wav_scp

        for utt in read_wav_scp(args.wav_scp):
            per_spk[utt_speaker(utt)].append(
                np.asarray(read_hdf5(args.embeddings_file, utt)).reshape(-1)
            )
    elif args.mode == "xvector":
        from ..models.xvector import load_xvector_model

        model = load_xvector_model(args.checkpoint)
        import jax.numpy as jnp

        for utt_id, audio, sr in iter_wav_scp(args.wav_scp):
            audio16 = resample(audio, sr, 16000)
            emb = np.asarray(model(jnp.asarray(audio16, jnp.float32)))
            per_spk[utt_speaker(utt_id)].append(emb.reshape(-1))

    for spk, embs in per_spk.items():
        avg = np.mean(np.stack(embs), axis=0)
        write_hdf5(args.out_file, spk, avg.astype(np.float32).reshape(1, -1))
    logging.info("wrote %d speaker embeddings -> %s", len(per_spk), args.out_file)


if __name__ == "__main__":
    main()
