"""Stage-5: any-to-any conversion inference CLI.

Reference: /root/reference/harana/bin/decode_fastsvc.py:33-209 — load the
latest checkpoint + its config.yml, fold weight norm, and for every target
speaker: mean-shift the source F0 (std forced to 1, :165), look up the
target x-vector, synthesize, write PCM16 wavs, report RTF.

TPU-native: utterances are bucketed by padded length and synthesized in
jitted batches (padding to a small set of static shapes keeps recompiles
bounded); throughput is reported as audio-seconds/s alongside RTF.
"""

from __future__ import annotations

import argparse
import logging
import os
import time

import numpy as np
import yaml

import jax
import jax.numpy as jnp

from ..config import (
    build_generator,
    build_signal_generator,
    load_config,
    parse_compute_dtype,
)
from ..data.dataset import FastSVCDataset
from ..data.hdf5 import read_hdf5
from ..dsp.f0 import F0Statistics
from ..ops import fold_weight_norm
from ..train.checkpoint import load_checkpoint
from .common import setup_logging, utt_speaker, write_wav


def load_f0_stats(path: str):
    with open(path) as f:
        d = yaml.safe_load(f)
    return np.array([d["f0_mean"], d["f0_std"]])


def decode(
    dumpdir: str,
    checkpoint_dir: str,
    outdir: str,
    *,
    f0_stats_dir: str,
    spk_emb_file: str,
    convert_to_speakers=None,
    config_path: str = None,
    pad_multiple: int = 100,
    batch_size: int = 16,
    infer_dtype: str = None,
):
    cfg_path = config_path or os.path.join(checkpoint_dir, "config.yml")
    cfg = load_config(cfg_path)
    sr = cfg["sampling_rate"]
    hop = cfg["hop_size"]
    # synthesis compute dtype: explicit infer_dtype key/flag, else the
    # training compute_dtype (recipe default bfloat16), else f32. Output
    # audio is always cast back to f32 before the PCM16 write.
    idt = parse_compute_dtype(
        infer_dtype or cfg.get("infer_dtype", cfg.get("compute_dtype"))
    )

    import dataclasses

    # inference-only FiLM fusion (models/fastsvc.py FastSVCGenerator.fuse_film)
    model = dataclasses.replace(build_generator(cfg), fuse_film=True)
    sig_gen = build_signal_generator(cfg)
    # restore generator params from the train-state checkpoint
    from ..config import build_train_task

    task = build_train_task(cfg)
    target = task.init_state(jax.random.PRNGKey(0))
    state, step = load_checkpoint(checkpoint_dir, target)
    logging.info("loaded checkpoint step %d from %s", step, checkpoint_dir)
    params = fold_weight_norm(state.g_params)

    ds = FastSVCDataset(dumpdir, return_utt_id=True)
    stats = F0Statistics()
    speakers = convert_to_speakers or cfg.get("convert_to_speakers", [])

    if idt is not None:
        cast = lambda t: jax.tree.map(  # noqa: E731
            lambda x: x.astype(idt) if x.dtype == jnp.float32 else x, t
        )
        params = cast(params)
        fwd = jax.jit(
            lambda p, ppg, sine, lft, emb: model.apply(
                p, *cast((ppg, sine, lft, emb))
            ).astype(jnp.float32)
        )
        logging.info("synthesis compute dtype: %s", jnp.dtype(idt).name)
    else:
        fwd = jax.jit(
            lambda p, ppg, sine, lft, emb: model.apply(p, ppg, sine, lft, emb)
        )

    os.makedirs(outdir, exist_ok=True)
    total_audio_s, total_wall = 0.0, 0.0
    for trgspk in speakers:
        trg_emb = np.asarray(read_hdf5(spk_emb_file, trgspk), np.float32).reshape(-1)
        trg_stats = load_f0_stats(os.path.join(f0_stats_dir, f"{trgspk}.yml"))
        trg_stats[1] = 1.0  # mean-only shift (reference :165)

        # bucket utterances by padded frame count, then synthesize each
        # bucket as one batched jitted call (BASELINE "batched inference")
        buckets: dict = {}
        for i in range(len(ds)):
            utt_id, _, f0, ppg, lft, _ = ds[i]
            Tf = len(ppg)
            Tp = ((Tf + pad_multiple - 1) // pad_multiple) * pad_multiple
            buckets.setdefault(Tp, []).append((utt_id, f0, ppg, lft, Tf))

        for Tp, items in sorted(buckets.items()):
            for chunk_start in range(0, len(items), batch_size):
                chunk = items[chunk_start : chunk_start + batch_size]
                Bc = len(chunk)
                D = chunk[0][2].shape[-1]
                ppg_p = np.zeros((Bc, Tp, D), np.float32)
                f0_p = np.zeros((Bc, Tp, 1), np.float32)
                lft_p = np.zeros((Bc, Tp * hop, 1), np.float32)
                for bi, (utt_id, f0, ppg, lft, Tf) in enumerate(chunk):
                    src_stats = load_f0_stats(
                        os.path.join(f0_stats_dir, f"{utt_speaker(utt_id)}.yml")
                    )
                    src_stats[1] = 1.0
                    cv_f0 = stats.convert(
                        np.asarray(f0).squeeze(), src_stats, trg_stats
                    )
                    ppg_p[bi, :Tf] = ppg
                    f0_p[bi, :Tf, 0] = cv_f0
                    lft_p[bi, : Tf * hop, 0] = np.asarray(lft).squeeze()[: Tf * hop]
                emb_p = np.broadcast_to(trg_emb, (Bc, trg_emb.shape[0]))

                t0 = time.time()
                sine = sig_gen(jnp.asarray(f0_p), jax.random.PRNGKey(chunk_start))
                y = np.asarray(
                    fwd(params, jnp.asarray(ppg_p), sine, jnp.asarray(lft_p),
                        jnp.asarray(emb_p))
                )
                wall = time.time() - t0
                total_wall += wall
                for bi, (utt_id, _, _, _, Tf) in enumerate(chunk):
                    out = y[bi, : Tf * hop, 0]
                    total_audio_s += len(out) / sr
                    write_wav(
                        os.path.join(outdir, f"{utt_id}_to_{trgspk}.wav"), out, sr
                    )
    rtf = total_wall / max(total_audio_s, 1e-9)
    logging.info(
        "decoded %.1f audio-s in %.2f s (RTF %.4f, %.0f audio-s/s)",
        total_audio_s, total_wall, rtf, total_audio_s / max(total_wall, 1e-9),
    )
    return rtf


def main(argv=None):
    parser = argparse.ArgumentParser(description="Decode FastSVC (TPU)")
    parser.add_argument("--dumpdir", required=True)
    parser.add_argument("--checkpoint-dir", required=True)
    parser.add_argument("--outdir", required=True)
    parser.add_argument("--f0-stats-dir", required=True)
    parser.add_argument("--spk-emb-file", required=True)
    parser.add_argument("--speakers", nargs="*", default=None)
    parser.add_argument("--config", default=None)
    parser.add_argument("--infer-dtype", default=None,
                        choices=[None, "f32", "float32", "bf16", "bfloat16"],
                        help="synthesis compute dtype (default: the config's "
                             "infer_dtype, else its compute_dtype, else f32)")
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args(argv)
    setup_logging(args.verbose)
    decode(
        args.dumpdir, args.checkpoint_dir, args.outdir,
        f0_stats_dir=args.f0_stats_dir, spk_emb_file=args.spk_emb_file,
        convert_to_speakers=args.speakers, config_path=args.config,
        infer_dtype=args.infer_dtype,
    )


if __name__ == "__main__":
    main()
