"""Stage-4: FastSVC GAN training CLI.

Reference: /root/reference/harana/bin/train_fastsvc.py:560-819. Builds the
dataset/batcher/task from the YAML config, dumps the merged config into the
experiment dir (the decode contract), and runs the step-based loop with
log/eval/save intervals, resume (--resume) and params-only warm start
(--pretrain).
"""

from __future__ import annotations

import argparse
import logging

import jax

from ..config import build_train_task, dump_config, load_config
from ..data import FastSVCBatcher, FastSVCDataset
from ..train.loop import Trainer
from .common import setup_logging


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train FastSVC (TPU)")
    parser.add_argument("--train-dumpdir", required=True)
    parser.add_argument("--dev-dumpdir", default=None)
    parser.add_argument("--outdir", required=True)
    parser.add_argument("--config", required=True)
    parser.add_argument("--resume", default="", nargs="?", const="auto")
    parser.add_argument("--pretrain", default="")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--n-devices", type=int, default=None,
                        help="data-parallel devices (default: all)")
    parser.add_argument("--n-procs", type=int, default=None,
                        help="multi-host: total number of launcher processes")
    parser.add_argument("--proc-id", type=int, default=None,
                        help="multi-host: this process's index (0-based)")
    parser.add_argument("--coordinator", default=None,
                        help="multi-host: coordinator address host:port")
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args(argv)
    setup_logging(args.verbose)

    # Multi-host bring-up must precede any device use: afterwards
    # jax.devices() is the global slice and process_count() > 1.
    multihost = bool(args.n_procs and args.n_procs > 1)
    if multihost:
        from ..parallel import distributed

        distributed.initialize(args.coordinator, args.n_procs, args.proc_id)
    is_main = jax.process_index() == 0

    cfg = load_config(args.config)
    cfg["outdir"] = args.outdir
    if is_main:
        dump_config(cfg, args.outdir)

    task = build_train_task(cfg)
    state = task.init_state(jax.random.PRNGKey(args.seed))

    train_ds = FastSVCDataset(args.train_dumpdir)

    # Each process loads its local share of the global batch; the global
    # batch_size from the config is the cross-host total (reference
    # semantics: conf batch_size == what the optimizer sees per step).
    local_bs, rem = divmod(cfg["batch_size"], jax.process_count())
    if rem:
        raise ValueError(
            f"batch_size {cfg['batch_size']} not divisible by "
            f"{jax.process_count()} processes"
        )

    def make_batcher(seed):
        return FastSVCBatcher(
            train_ds,
            batch_size=local_bs,
            batch_length=cfg["batch_length"],
            hop_size=cfg["hop_size"],
            aux_context_window=cfg.get("aux_context_window", 0),
            use_spk_emb=cfg.get("generator_params", {}).get("use_spk_emb", True),
            seed=seed,
        )

    # disjoint per-host random streams (HostShardedBatcher convention)
    host_seed = args.seed + 1000 * jax.process_index()
    n_loader_threads = int(cfg.get("loader_threads", 1))
    train_batcher = None
    if n_loader_threads > 1:
        # Preferred: the fully native producer loop (C++ RNG + assembly +
        # ring queue, zero GIL); falls back to the Python thread pool when
        # libbatch.so is unavailable or the config needs the loop path.
        from ..data.native_batch import make_native_producer

        train_batcher = make_native_producer(
            make_batcher(host_seed),
            n_threads=n_loader_threads,
            seed=host_seed,
            hold=2 * max(1, int(cfg.get("steps_per_call", 1))),
        )
        if train_batcher is not None:
            logging.info("native batch producer (%d threads)", n_loader_threads)
        else:
            from ..data.prefetch import BatcherPool

            train_batcher = BatcherPool(
                make_batcher, n_threads=n_loader_threads, seed=host_seed
            )
    if train_batcher is None:
        train_batcher = make_batcher(host_seed)
    dev_batcher = None
    if args.dev_dumpdir:
        dev_ds = FastSVCDataset(args.dev_dumpdir)
        dev_batcher = FastSVCBatcher(
            dev_ds,
            batch_size=local_bs,
            batch_length=cfg["batch_length"],
            hop_size=cfg["hop_size"],
            use_spk_emb=cfg.get("generator_params", {}).get("use_spk_emb", True),
            seed=args.seed + 1,  # same dev stream on every host
        )

    mesh = None
    if multihost or args.n_devices is None or args.n_devices > 1:
        from ..parallel import make_mesh

        n = args.n_devices if (args.n_devices and not multihost) else len(
            jax.devices()
        )
        if n > 1:
            mesh = make_mesh(n)
            logging.info(
                "data-parallel over %d devices (%d processes)",
                n, jax.process_count(),
            )

    writer = None
    if is_main:
        try:
            from tensorboardX import SummaryWriter

            writer = SummaryWriter(args.outdir)
        except Exception:
            logging.warning("tensorboardX unavailable; scalar logging disabled")

    trainer = Trainer(
        task, state, train_batcher,
        config=cfg, outdir=args.outdir, dev_batcher=dev_batcher,
        writer=writer, mesh=mesh, multihost=multihost,
    )
    if args.pretrain:
        trainer.resume(args.pretrain, params_only=True)
    if args.resume:
        trainer.resume(None if args.resume == "auto" else args.resume)
    trainer.install_preemption_handler()
    trainer.run()
    if trainer.preempted:
        # EX_TEMPFAIL: tells the scheduler/wrapper this was a graceful
        # preemption with a resumable checkpoint, not a failure
        import sys

        logging.info("preempted; checkpoint saved — exiting 75")
        sys.exit(75)
    logging.info("finished training.")


if __name__ == "__main__":
    main()
