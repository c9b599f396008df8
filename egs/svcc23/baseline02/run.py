#!/usr/bin/env python3
"""B02 decomposed recipe: staged pipeline driver (TPU).

Mirrors /root/reference/egs/svcc23/baseline02/run.sh:44-209:
  stage 0: speaker embeddings
  stage 1: feature extraction (linguistic units + WORLD analysis)
  stage 2: statistics
  stage 3: normalization
  stage 4: Tacotron2 acoustic model training
  stage 5: acoustic model decoding -> converted feature bundles
  stage 7: HN-uSFGAN vocoder synthesis (expects a vocoder checkpoint dir)
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
    """Launcher job array (Kaldi `${train_cmd} JOB=1:N` role; see
    svcc23_fastsvc_tpu/utils/launcher.py and the fastsvc1 driver)."""
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
    p.add_argument("--stop-stage", type=int, default=7)
    p.add_argument("--conf", default="conf/taco2.yaml")
    p.add_argument("--f0-conf", default="conf/f0.yml")
    p.add_argument("--datadir", default="data")
    p.add_argument("--dumpdir", default="dump")
    p.add_argument("--expdir", default="exp")
    p.add_argument("--tag", default="taco2")
    p.add_argument("--linguistic", default="logmel", choices=["logmel", "hubert"])
    p.add_argument("--hubert-checkpoint", default=None)
    p.add_argument("--vocoder-dir", default=None)
    p.add_argument("--f0-stats", default="conf/f0.yml",
                   help="per-speaker yaml with lf0_mean/lf0_scale (the "
                        "shipped conf/f0.yml carries both the Harvest "
                        "ranges and the conversion stats)")
    p.add_argument("--speakers", nargs="*", default=["IDM1"])
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

    train_scp = os.path.join(args.datadir, "train", "wav.scp")
    dev_scp = os.path.join(args.datadir, "dev", "wav.scp")
    spk_embs = os.path.join(args.dumpdir, "spk_embs.h5")
    exp = os.path.join(args.expdir, args.tag)

    def dump(split, norm=False):
        return os.path.join(args.dumpdir, f"{split}{'_norm' if norm else ''}")

    if args.stage <= 0 <= args.stop_stage:
        sh("extract_spk_embs", "--wav-scp", train_scp, "--out-file", spk_embs,
           "--mode", "hash")

    if args.stage <= 1 <= args.stop_stage:
        for split, scp in (("train", train_scp), ("dev", dev_scp)):
            if not os.path.exists(scp):
                continue
            extra = []
            if args.linguistic == "hubert":
                extra = ["--hubert-checkpoint", args.hubert_checkpoint]
            if os.path.exists(args.f0_conf):
                extra += ["--f0-config", args.f0_conf]
            common = ["--wav-scp", scp, "--dumpdir", dump(split),
                      "--config", args.conf, "--spk-emb-file", spk_embs,
                      "--linguistic", args.linguistic, *extra]
            if args.n_jobs > 1:  # launcher job array (run.pl JOB=1:N role)
                sh_array(args, args.n_jobs, f"preprocess_{split}",
                         "preprocess_b02", *common,
                         "--n-shards", "{n_jobs}", "--shard-id", "{job}")
            else:
                sh("preprocess_b02", *common)

    stats = os.path.join(args.dumpdir, "stats_b02.joblib")
    if args.stage <= 2 <= args.stop_stage:
        sh("compute_statistics_b02", "--dumpdir", dump("train"),
           "--dumpfile", stats)

    if args.stage <= 3 <= args.stop_stage:
        for split in ("train", "dev"):
            if os.path.isdir(dump(split)):
                sh("normalize_b02", "--dumpdir", dump(split),
                   "--outdir", dump(split, norm=True), "--stats", stats)

    if args.stage <= 4 <= args.stop_stage:
        extra = []
        if os.path.isdir(dump("dev", norm=True)):
            extra = ["--dev-dumpdir", dump("dev", norm=True)]
        sh("train_b02", "--train-dumpdir", dump("train", norm=True),
           "--outdir", exp, "--config", args.conf, "--resume", *extra)

    if args.stage <= 5 <= args.stop_stage:
        sh("decode_b02", "--dumpdir", dump("dev", norm=True),
           "--checkpoint-dir", exp,
           "--outdir", os.path.join(exp, "decoded"),
           "--spk-emb-file", spk_embs,
           "--f0-stats", args.f0_stats,
           "--speakers", *args.speakers)

    if args.stage <= 7 <= args.stop_stage and args.vocoder_dir:
        sh("synthesize_b02", "--dumpdir", os.path.join(exp, "decoded"),
           "--outdir", os.path.join(exp, "wav"),
           "--checkpoint-dir", args.vocoder_dir)


if __name__ == "__main__":
    main()
