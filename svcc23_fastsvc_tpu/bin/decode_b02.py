"""B02 stage-5: Tacotron2 free-running decode → converted feature bundles.

Reference: /root/reference/harana/bin/decode_b02.py — per target speaker:
semitone-rounded F0 shift in cents relative to C4, free-running Tacotron2
inference, write mcep/bap/lf0/lft/ppg/f0/wave h5 bundles for the vocoder
stage. (Reference fun fact: its `if __name__ == "__main__"` is mis-indented
inside main(), decode_b02.py:346-347, so direct execution is a no-op there.)
"""

from __future__ import annotations

import argparse
import logging
import math
import os

import numpy as np
import yaml

import jax
import jax.numpy as jnp

from ..config import load_config
from ..data.dataset import B02Dataset
from ..data.hdf5 import read_hdf5, write_hdf5
from ..train.checkpoint import load_checkpoint
from .common import setup_logging, utt_speaker

_C4_HZ = 440.0 * 2 ** (3 / 12 - 1)
_C4_CENT = 4800.0


def semitone_shift(src_lf0_mean: float, tgt_lf0_mean: float) -> int:
    """Semitone-rounded F0 shift (reference decode_b02.py:310-323)."""
    src_cent = 1200 * math.log(math.exp(src_lf0_mean) / _C4_HZ) / math.log(2) + _C4_CENT
    tgt_cent = 1200 * math.log(math.exp(tgt_lf0_mean) / _C4_HZ) / math.log(2) + _C4_CENT
    return round((tgt_cent - src_cent) / 100)


def decode_b02(
    dumpdir: str,
    checkpoint_dir: str,
    outdir: str,
    *,
    spk_emb_file: str,
    f0_stats: dict,
    speakers,
    config_path: str | None = None,
    max_frames: int = 400,
    infer_dtype: str | None = None,
):
    from ..config import parse_compute_dtype
    from .train_b02 import build_b02_task

    cfg = load_config(config_path or os.path.join(checkpoint_dir, "config.yml"))
    task = build_b02_task(cfg)
    target = task.init_state(jax.random.PRNGKey(0))
    state, step = load_checkpoint(checkpoint_dir, target)
    logging.info("loaded B02 checkpoint step %d", step)
    params = task._apply_bn(state.g_params, state.g_bn)

    # inference dtype: explicit flag, else the config's infer_dtype, else
    # the training compute_dtype, else f32 (decode_fastsvc convention)
    dt = parse_compute_dtype(
        infer_dtype or cfg.get("infer_dtype", cfg.get("compute_dtype"))
    )
    if dt is not None:
        cast = lambda t: jax.tree.map(  # noqa: E731
            lambda x: x.astype(dt) if hasattr(x, "dtype")
            and x.dtype == jnp.float32 else x, t
        )
        params = cast(params)
        logging.info("decoding in %s", jnp.dtype(dt).name)
    else:
        cast = lambda t: t  # noqa: E731

    ds = B02Dataset(dumpdir, return_utt_id=True)
    os.makedirs(outdir, exist_ok=True)

    fwd = jax.jit(
        lambda ppg, lens, lft, lf0, emb: task.generator.apply(
            params, cast(ppg), lens, cast(lft), cast(lf0), cast(emb),
            None, train=False,
        )[0].astype(jnp.float32)
    )

    for trgspk in speakers:
        emb = np.asarray(read_hdf5(spk_emb_file, trgspk), np.float32).reshape(1, -1)
        for i in range(len(ds)):
            utt_id, wave, f0, ppg, lft, lf0, vuv, mcep, bap = ds[i][:9]
            src = utt_speaker(utt_id)
            shift = semitone_shift(
                f0_stats[src]["lf0_mean"], f0_stats[trgspk]["lf0_mean"]
            )
            ratio = 2.0 ** (shift / 12.0)
            lf0_c = np.asarray(lf0, np.float32) * ratio
            f0_c = np.asarray(f0, np.float32) * ratio

            L = min(len(ppg), max_frames)
            ppg_p = np.zeros((1, max_frames, ppg.shape[-1]), np.float32)
            ppg_p[0, :L] = ppg[:L]
            lft_p = np.zeros((1, max_frames, 1), np.float32)
            lft_p[0, :L] = np.asarray(lft).reshape(-1, 1)[:L]
            lf0_p = np.zeros((1, max_frames, 1), np.float32)
            lf0_p[0, :L] = lf0_c.reshape(-1, 1)[:L]

            pred = np.asarray(
                fwd(
                    jnp.asarray(ppg_p), jnp.asarray([L]), jnp.asarray(lft_p),
                    jnp.asarray(lf0_p), jnp.asarray(emb),
                )
            )[0, :L]
            mcep_c, bap_c = pred[:, :60], pred[:, 60:]

            out = os.path.join(outdir, f"{utt_id}_{trgspk}.h5")
            write_hdf5(out, "mcep", mcep_c)
            write_hdf5(out, "bap", bap_c)
            write_hdf5(out, "lf0", lf0_c.reshape(-1, 1)[:L])
            write_hdf5(out, "lft", np.asarray(lft).reshape(-1, 1)[:L])
            write_hdf5(out, "ppg", np.asarray(ppg)[:L])
            write_hdf5(out, "f0", f0_c.reshape(-1, 1)[:L])
            write_hdf5(out, "wave", np.asarray(wave, np.float32))
    logging.info("decoded %d utterances x %d speakers -> %s",
                 len(ds), len(speakers), outdir)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Decode B02 (TPU)")
    parser.add_argument("--dumpdir", required=True)
    parser.add_argument("--checkpoint-dir", required=True)
    parser.add_argument("--outdir", required=True)
    parser.add_argument("--spk-emb-file", required=True)
    parser.add_argument("--f0-stats", required=True,
                        help="yaml with per-speaker lf0_mean/lf0_scale")
    parser.add_argument("--speakers", nargs="+", required=True)
    parser.add_argument("--config", default=None)
    parser.add_argument("--infer-dtype", default=None,
                        choices=[None, "f32", "float32", "bf16", "bfloat16"],
                        help="acoustic-model decode dtype (default: config "
                             "infer_dtype, else compute_dtype, else f32)")
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args(argv)
    setup_logging(args.verbose)
    with open(args.f0_stats) as f:
        f0_stats = yaml.safe_load(f)
    decode_b02(
        args.dumpdir, args.checkpoint_dir, args.outdir,
        spk_emb_file=args.spk_emb_file, f0_stats=f0_stats,
        speakers=args.speakers, config_path=args.config,
        infer_dtype=args.infer_dtype,
    )


if __name__ == "__main__":
    main()
