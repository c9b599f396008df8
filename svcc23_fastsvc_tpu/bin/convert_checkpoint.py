"""Convert a reference PyTorch checkpoint into a framework checkpoint.

Bridges the migration path: a user of the reference
(checkpoint-XXXsteps.pkl from harana-train-fastsvc, train_fastsvc.py:104-128)
runs this once and then uses svc-tpu-decode-fastsvc unchanged.

The torch optimizer/scheduler state is not meaningful to optax, so the
output is a params-only warm start: resume training with --pretrain, or
decode directly (decode only reads generator params).
"""

from __future__ import annotations

import argparse
import logging

import jax

from ..compat import (
    convert_fastsvc_generator,
    convert_hifigan_msd_mpd,
    convert_melgan_msd,
)
from ..config import build_train_task, load_config
from ..train.checkpoint import save_checkpoint
from .common import setup_logging


def convert_fastsvc_checkpoint(pkl_path: str, config_path: str, outdir: str):
    import torch

    sd = torch.load(pkl_path, map_location="cpu", weights_only=False)
    steps = int(sd.get("steps", 0))
    gen_sd = sd["model"]["generator"]
    dis_sd = sd["model"]["discriminator"]

    cfg = load_config(config_path)
    task = build_train_task(cfg)
    state = task.init_state(jax.random.PRNGKey(0))

    g_params = convert_fastsvc_generator(gen_sd)
    dtype = cfg.get("discriminator_type", "MelGANMultiScaleDiscriminator")
    if dtype == "MelGANMultiScaleDiscriminator":
        d_params = convert_melgan_msd(
            dis_sd, scales=cfg.get("discriminator_params", {}).get("scales", 3)
        )
    else:
        d_params = convert_hifigan_msd_mpd(dis_sd)

    state = state.replace(g_params=g_params, d_params=d_params)
    save_checkpoint(outdir, state, steps, config=cfg)
    logging.info(
        "converted %s (step %d) -> %s", pkl_path, steps, outdir
    )
    return steps


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Convert reference .pkl checkpoints to framework format"
    )
    parser.add_argument("--checkpoint", required=True, help="reference .pkl")
    parser.add_argument("--config", required=True,
                        help="training config yaml (reference-compatible)")
    parser.add_argument("--outdir", required=True)
    parser.add_argument("--recipe", default="fastsvc", choices=["fastsvc"])
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args(argv)
    setup_logging(args.verbose)
    convert_fastsvc_checkpoint(args.checkpoint, args.config, args.outdir)


if __name__ == "__main__":
    main()
