#!/usr/bin/env python3
"""FastSVC recipe: staged pipeline driver (TPU).

Mirrors the reference shell recipe (/root/reference/egs/svcc23/fastsvc1/
run.sh:40-186) as a single Python driver:

  stage 0: speaker embedding extraction      (harana stage 0)
  stage 1: feature extraction                (harana stage 1)
  stage 2: per-speaker F0 statistics         (harana stage 2)
  stage 3: statistics + normalization        (harana stage 3)
  stage 4: GAN training                      (harana stage 4)
  stage 5: decoding                          (harana stage 5)

Usage:
  python run.py --stage 0 --stop-stage 5 --conf conf/fastsvc.yaml \
      --datadir data --expdir exp --tag my_run

Expects data/{train,dev,eval}/wav.scp. The Kaldi job-array layer of the
reference (run.pl/queue.pl/slurm.pl/ssh.pl selected by cmd.sh) is the
launcher module (svcc23_fastsvc_tpu.utils.launcher) selected by --cmd:

  --cmd local --n-jobs 8       stage 1 fans feature extraction over 8
                               scp-sharded local processes (run.pl role)
  --cmd slurm --n-jobs 32      same as one sbatch array (slurm.pl role)
  --cmd ssh --hosts h0,h1      jobs round-robin over hosts (ssh.pl role);
                               with --n-procs N, stage 4 launches the N
                               jax.distributed training processes itself
                               (one per host, --proc-id assigned)

Manual multi-host placement still works: run this driver once per host
with --n-procs N --proc-id I --coordinator H:P (stage 1 then shards the
scp by process id; single-process stages run on process 0 only; hosts
must share the dump filesystem, as in Kaldi).
"""

import argparse
import os
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..", ".."))
sys.path.insert(0, REPO)

from svcc23_fastsvc_tpu.utils import launcher  # noqa: E402


def _env():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _mod_cmd(mod, *args):
    return [sys.executable, "-m", f"svcc23_fastsvc_tpu.bin.{mod}",
            *map(str, args)]


def sh(mod, *args):
    cmd = _mod_cmd(mod, *args)
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, env=_env())


def sh_array(args_ns, n_jobs, name, mod, *argv):
    """Run a {job}-templated module command as an n_jobs array via the
    configured launcher backend (the `${train_cmd} JOB=1:N` role)."""
    cmd = _mod_cmd(mod, *argv)
    print(f"+ [{args_ns.cmd} x{n_jobs}]", " ".join(cmd), flush=True)
    launcher.launch(
        cmd, n_jobs, backend=args_ns.cmd,
        log_dir=os.path.join(args_ns.expdir, "log"), name=name,
        max_parallel=args_ns.max_parallel,
        hosts=args_ns.hosts.split(",") if args_ns.hosts else None,
        env={"PYTHONPATH": _env()["PYTHONPATH"]},
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", type=int, default=0)
    p.add_argument("--stop-stage", type=int, default=5)
    p.add_argument("--conf", default="conf/fastsvc.yaml")
    p.add_argument("--f0-conf", default="conf/f0.yml")
    p.add_argument("--datadir", default="data")
    p.add_argument("--dumpdir", default="dump")
    p.add_argument("--expdir", default="exp")
    p.add_argument("--tag", default="fastsvc")
    p.add_argument("--linguistic", default="logmel", choices=["logmel", "conformer"])
    p.add_argument("--ppg-checkpoint", default=None)
    p.add_argument("--xvector-checkpoint", default=None,
                   help="SpeechBrain embedding_model.ckpt; stage 0 extracts "
                        "real x-vectors instead of hash embeddings")
    p.add_argument("--speakers", nargs="*", default=None)
    p.add_argument("--n-procs", type=int, default=1,
                   help="multi-host: total jax.distributed processes")
    p.add_argument("--proc-id", type=int, default=None,
                   help="multi-host: this process's index (omit to have "
                        "the launcher place all --n-procs processes)")
    p.add_argument("--coordinator", default="127.0.0.1:12321",
                   help="multi-host: jax.distributed coordinator host:port")
    p.add_argument("--cmd", default="local",
                   choices=["local", "ssh", "slurm", "sge"],
                   help="launcher backend for job arrays (cmd.sh role)")
    p.add_argument("--n-jobs", type=int, default=1,
                   help="stage 1 feature-extraction array width")
    p.add_argument("--hosts", default=None,
                   help="comma-separated host list for --cmd ssh")
    p.add_argument("--max-parallel", type=int, default=None,
                   help="cap on concurrently running array jobs")
    args = p.parse_args()
    multiproc = args.n_procs > 1
    launch_train = multiproc and args.proc_id is None
    main_proc = args.proc_id in (None, 0)

    train_scp = os.path.join(args.datadir, "train", "wav.scp")
    dev_scp = os.path.join(args.datadir, "dev", "wav.scp")
    spk_embs = os.path.join(args.dumpdir, "spk_embs.h5")
    exp = os.path.join(args.expdir, args.tag)

    def dump(split, norm=False):
        return os.path.join(args.dumpdir, f"{split}{'_norm' if norm else ''}")

    if args.stage <= 0 <= args.stop_stage and main_proc:
        if args.xvector_checkpoint:  # production path (reference stage 0)
            sh("extract_spk_embs", "--wav-scp", train_scp,
               "--out-file", spk_embs, "--mode", "xvector",
               "--checkpoint", args.xvector_checkpoint)
        else:  # self-contained fallback without pretrained weights
            sh("extract_spk_embs", "--wav-scp", train_scp,
               "--out-file", spk_embs, "--mode", "hash")

    if args.stage <= 1 <= args.stop_stage:
        for split, scp in (("train", train_scp), ("dev", dev_scp)):
            if not os.path.exists(scp):
                continue
            extra = []
            if args.linguistic == "conformer":
                extra = ["--ppg-checkpoint", args.ppg_checkpoint]
            if os.path.exists(args.f0_conf):
                extra += ["--f0-config", args.f0_conf]
            common = ["--wav-scp", scp, "--dumpdir", dump(split),
                      "--config", args.conf, "--spk-emb-file", spk_embs,
                      "--linguistic", args.linguistic, *extra]
            if multiproc and args.proc_id is not None:
                # manual placement: this process handles its own shard
                sh("preprocess_fastsvc", *common,
                   "--n-shards", args.n_procs, "--shard-id", args.proc_id)
            elif args.n_jobs > 1:  # launcher job array (run.pl JOB=1:N role)
                sh_array(args, args.n_jobs, f"preprocess_{split}",
                         "preprocess_fastsvc", *common,
                         "--n-shards", "{n_jobs}", "--shard-id", "{job}")
            else:
                sh("preprocess_fastsvc", *common)

    if args.stage <= 2 <= args.stop_stage and main_proc:
        sh("compute_f0stats", "--dumpdir", dump("train"),
           "--outdir", os.path.join(args.dumpdir, "f0_stats"))

    if args.stage <= 3 <= args.stop_stage and main_proc:
        stats = os.path.join(args.dumpdir, "stats.joblib")
        sh("compute_statistics_fastsvc", "--dumpdir", dump("train"),
           "--dumpfile", stats)
        for split in ("train", "dev"):
            if os.path.isdir(dump(split)):
                sh("normalize_fastsvc", "--dumpdir", dump(split),
                   "--outdir", dump(split, norm=True), "--stats", stats)

    if args.stage <= 4 <= args.stop_stage:
        extra = []
        if os.path.isdir(dump("dev", norm=True)):
            extra = ["--dev-dumpdir", dump("dev", norm=True)]
        train_argv = ["--train-dumpdir", dump("train", norm=True),
                      "--outdir", exp, "--config", args.conf, "--resume",
                      *extra]
        if launch_train:
            # the driver places all N jax.distributed processes itself
            # (one per --hosts entry under --cmd ssh; N local processes
            # under --cmd local, e.g. CPU multi-process testing)
            sh_array(args, args.n_procs, "train", "train_fastsvc",
                     *train_argv, "--n-procs", args.n_procs,
                     "--proc-id", "{job}", "--coordinator", args.coordinator)
        elif multiproc:
            sh("train_fastsvc", *train_argv, "--n-procs", args.n_procs,
               "--proc-id", args.proc_id, "--coordinator", args.coordinator)
        else:
            sh("train_fastsvc", *train_argv)

    if args.stage <= 5 <= args.stop_stage and main_proc:
        extra = []
        if args.speakers:
            extra = ["--speakers", *args.speakers]
        sh("decode_fastsvc", "--dumpdir", dump("dev", norm=True),
           "--checkpoint-dir", exp,
           "--outdir", os.path.join(exp, "wav"),
           "--f0-stats-dir", os.path.join(args.dumpdir, "f0_stats"),
           "--spk-emb-file", spk_embs, *extra)


if __name__ == "__main__":
    main()
