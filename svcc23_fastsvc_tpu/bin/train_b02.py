"""B02 stage-4: Tacotron2 acoustic model training CLI.

Reference: /root/reference/harana/bin/train_b02.py:478-771.
"""

from __future__ import annotations

import argparse
import logging

import jax

from ..config import dump_config, load_config, parse_compute_dtype
from ..data.collate import B02Batcher
from ..data.dataset import B02Dataset
from ..models.tacotron2 import MultiSubFreqDiscriminator, Tacotron2
from ..train.b02 import B02TrainTask
from ..train.loop import Trainer
from ..train.state import make_optimizer
from .common import setup_logging


def build_b02_task(cfg: dict) -> B02TrainTask:
    gp = dict(cfg.get("generator_params", {}))
    gen = Tacotron2(
        input_dim=gp.get("input_dim", 256),
        output_dim=gp.get("output_dim", 60),
        hidden_dim=gp.get("hidden_dim", 1024),
        dec_layers=gp.get("dec_layers", 2),
        multi_speaker=gp.get("multi_speaker", True),
        spk_emb_dim=gp.get("spk_emb_dim", 512),
        integrate_logf0=gp.get("integrate_logf0", True),
        econv_chans=gp.get("econv_chans", 512),
        prenet_dim=gp.get("prenet_dim", 256),
    )
    dis = MultiSubFreqDiscriminator.from_config(cfg.get("discriminator_params", {}))
    g_opt = cfg.get("generator_optimizer_params", {})
    g_sch = cfg.get("generator_scheduler_params", {})
    d_opt = cfg.get("discriminator_optimizer_params", {})
    d_sch = cfg.get("discriminator_scheduler_params", {})
    return B02TrainTask(
        generator=gen,
        discriminator=dis,
        g_tx=make_optimizer(
            lr=g_opt.get("lr", 1e-3), eps=g_opt.get("eps", 1e-6),
            grad_norm=cfg.get("generator_grad_norm", 1),
            scheduler_step_size=g_sch.get("step_size", 100000),
            scheduler_gamma=g_sch.get("gamma", 0.5),
        ),
        d_tx=make_optimizer(
            lr=d_opt.get("lr", 1e-3), eps=d_opt.get("eps", 1e-6),
            grad_norm=cfg.get("discriminator_grad_norm", 1),
            scheduler_step_size=d_sch.get("step_size", 100000),
            scheduler_gamma=d_sch.get("gamma", 0.5),
        ),
        lambda_l1=cfg.get("lambda_l1", 1.0),
        lambda_adv=cfg.get("lambda_adv", 1.0),
        compute_dtype=parse_compute_dtype(cfg.get("compute_dtype")),
    )


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train B02 acoustic model (TPU)")
    parser.add_argument("--train-dumpdir", required=True)
    parser.add_argument("--dev-dumpdir", default=None)
    parser.add_argument("--outdir", required=True)
    parser.add_argument("--config", required=True)
    parser.add_argument("--resume", default="", nargs="?", const="auto")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--max-frames", type=int, default=400)
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args(argv)
    setup_logging(args.verbose)

    cfg = load_config(args.config)
    cfg["outdir"] = args.outdir
    dump_config(cfg, args.outdir)

    task = build_b02_task(cfg)
    state = task.init_state(jax.random.PRNGKey(args.seed))

    train_ds = B02Dataset(args.train_dumpdir)
    train_batcher = B02Batcher(
        train_ds, batch_size=cfg.get("batch_size", 16),
        max_frames=args.max_frames, seed=args.seed,
    )
    dev_batcher = None
    if args.dev_dumpdir:
        dev_batcher = B02Batcher(
            B02Dataset(args.dev_dumpdir), batch_size=cfg.get("batch_size", 16),
            max_frames=args.max_frames, seed=args.seed + 1,
        )

    trainer = Trainer(
        task, state, train_batcher, config=cfg, outdir=args.outdir,
        dev_batcher=dev_batcher,
    )
    if args.resume:
        trainer.resume(None if args.resume == "auto" else args.resume)
    trainer.install_preemption_handler()
    trainer.run()
    if trainer.preempted:
        import sys

        logging.info("preempted; checkpoint saved — exiting 75")
        sys.exit(75)
    logging.info("finished B02 training.")


if __name__ == "__main__":
    main()
