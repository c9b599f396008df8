"""CLI-sustained throughput certification (VERDICT r2 next #4, r3 next #4/#8).

bench.py times the jitted step on a pre-staged device batch; this tool
certifies that the REAL training CLI — HDF5 dataset, native producer ring,
prefetch, scanned dispatch, checkpointing — sustains a comparable rate.
It builds a synthetic 24 kHz feature corpus, runs
`python -m svcc23_fastsvc_tpu.bin.train_fastsvc` at the production bench
shape (batch 32 x 1 s, [5,4,4,2] generator, bf16 compute, steps_per_call
16, full GAN phase), parses the loop's own per-interval log lines
(train/loop.py _flush_logs), and writes SOAK_r{N}.json.

Round-4 additions:
  * per-interval wall-time attribution (data_wait/step_wait/eval/save from
    the instrumented loop) and p10/p50/p90 of the sustained rate — dips are
    attributed, not averaged away;
  * --preempt-at-s N: SIGTERMs the child mid-run, expects the graceful
    checkpoint-and-exit-75 contract, restarts with --resume, and records
    restart-to-training latency plus the continued loss trajectory;
  * --eval-every N: periodic eval + intermediate wav/png artifacts against
    a dev split (checkpoint rotation exercised via save_interval_steps).

Round-5 additions:
  * honest rate metric: the loop now counts the log-flush device-queue
    drain inside each interval's wall time (train/loop.py), so the rate
    cannot be inflated by async backends that ack dispatches early.
    SOAK_r03.json predates this and overstated the tunnel-backend rate.
  * --wire packed|f32: host->device transfer wire format (data/wire.py,
    int16 audio + bf16 ppg + frame-rate lft, exact for the production
    pipeline); the synthetic corpus is PCM16-quantized and hop-constant
    in loudness like real preprocess output, so packed is bit-exact.

Usage: python tools/soak_cli.py [--steps 5000] [--out SOAK_r05.json]
"""

import argparse
import json
import os
import re
import signal
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 24000
HOP = 160
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def write_corpus(dumpdir: str, n_utts: int = 48, dur_s: float = 2.0):
    """Synthetic FastSVC feature dumps (same fields the preprocess CLI
    writes: wave/f0/ppg/lft at their pipeline rates, spk_emb)."""
    from svcc23_fastsvc_tpu.data.hdf5 import write_hdf5

    rng = np.random.default_rng(0)
    os.makedirs(dumpdir, exist_ok=True)
    T = int(SR * dur_s)
    F = T // HOP
    for i in range(n_utts):
        f0_base = rng.uniform(120.0, 350.0)
        t = np.arange(T) / SR
        f0_curve = f0_base * (1 + 0.02 * np.sin(2 * np.pi * 5 * t))
        phase = 2 * np.pi * np.cumsum(f0_curve) / SR
        wave = 0.3 * np.sin(phase) + 0.15 * np.sin(2 * phase)
        wave += 0.01 * rng.standard_normal(T)
        # quantize to the PCM16 grid — real wavs are 16-bit PCM decoded as
        # k/32768 (reference scp_dataset.py:150), which also makes the
        # int16 transfer wire format (data/wire.py) bit-exact
        wave = np.clip(np.round(wave * 32768.0), -32768, 32767) / 32768.0
        # loudness is hop-constant at sample rate in the real pipeline
        # (preprocess Stretch2d(hop,1) nearest upsample)
        lft = np.repeat(
            0.1 * rng.standard_normal(F).astype(np.float32), HOP
        )
        path = os.path.join(dumpdir, f"utt{i:04d}.h5")
        write_hdf5(path, "wave", wave.astype(np.float32))
        write_hdf5(path, "f0", f0_curve[::HOP][:F].astype(np.float32))
        write_hdf5(path, "ppg", rng.standard_normal((F, 144)).astype(np.float32))
        write_hdf5(path, "lft", lft)
        write_hdf5(path, "spk_emb",
                   rng.standard_normal(512).astype(np.float32))


def soak_config(steps: int, eval_every: int = 0, save_every: int = 0,
                wire: str = "packed") -> dict:
    return {
        # transfer wire format (data/wire.py): int16 audio + bf16 ppg +
        # frame-rate lft halve-or-better the per-step host->device bytes;
        # on remote-tunnel backends (~36 MB/s h2d) the f32 wire is
        # transfer-bound at ~250 ms/step vs the 97.7 ms device program
        "wire_format": wire,
        "sampling_rate": SR,
        "hop_size": HOP,
        "batch_size": 32,
        "batch_length": SR,  # 1 s crops, the bench shape
        "generator_type": "FastSVCGenerator",
        "generator_params": {
            "in_channels": 144,
            "out_channels": 1,
            "mid_channels": [192, 96, 48, 24],
            "upsampling_scales": [5, 4, 4, 2],
            "spk_emb_size": 512,
            "use_spk_emb": True,
        },
        "discriminator_type": "MelGANMultiScaleDiscriminator",
        "discriminator_params": {
            "scales": 3,
            "channels": 16,
            "max_downsample_channels": 512,
            "downsample_scales": [4, 4, 4],
        },
        "lambda_adv": 2.5,
        "signal_generator": {"signal_types": ["sine"]},
        "generator_optimizer_params": {"lr": 1.0e-3},
        "discriminator_optimizer_params": {"lr": 1.0e-3},
        "generator_grad_norm": 10,
        "discriminator_grad_norm": 1,
        # sustained regime: every step is a full GAN step (the bench metric)
        "discriminator_train_start_steps": 0,
        "train_max_steps": steps,
        "log_interval_steps": 320,
        "eval_interval_steps": eval_every or 10 * steps,
        "save_interval_steps": save_every or 10 * steps,
        "eval_batches": 2,
        "num_save_intermediate_results": 2 if eval_every else 0,
        "compute_dtype": "bfloat16",
        "steps_per_call": 16,
        "loader_threads": 4,
    }


_FIELDS = ("audio_s_per_s", "data_wait_s", "step_wait_s", "drain_s",
           "eval_s", "save_s", "discriminator_loss")


def parse_intervals(log: str):
    """Per-interval dicts from the loop's flush lines."""
    out = []
    for line in log.splitlines():
        if "audio_s_per_s" not in line:
            continue
        d = {}
        for f in _FIELDS:
            m = re.search(rf"{f}=([0-9.]+)", line)
            if m:
                d[f] = float(m.group(1))
        if "audio_s_per_s" in d:
            out.append(d)
    return out


def _restart_latency_s(log: str):
    """Seconds from the resumed process's first log line to its first
    training flush (timestamps come from the loop's own log format)."""
    import datetime as _dt

    def ts(line):
        m = re.match(r"(\d{4}-\d\d-\d\d \d\d:\d\d:\d\d)", line)
        if not m:
            return None
        return _dt.datetime.strptime(m.group(1), "%Y-%m-%d %H:%M:%S")

    first = None
    for line in log.splitlines():
        t = ts(line)
        if t is None:
            continue
        if first is None:
            first = t
        if "audio_s_per_s" in line:
            return (t - first).total_seconds()
    return None


def run_cli(cmd, *, preempt_at_s=None, cwd=REPO):
    """Run the trainer; optionally SIGTERM it after preempt_at_s seconds.
    Returns (rc, log, wall_s)."""
    t0 = time.time()
    proc = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=cwd, start_new_session=True,
    )
    if preempt_at_s is not None:
        time.sleep(preempt_at_s)
        proc.send_signal(signal.SIGTERM)
    log, _ = proc.communicate()
    return proc.returncode, log, time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--out", default="SOAK_r04.json")
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--preempt-at-s", type=float, default=None,
                    help="SIGTERM the trainer after N s, then resume")
    ap.add_argument("--eval-every", type=int, default=0,
                    help="eval_interval_steps (enables dev split + artifacts)")
    ap.add_argument("--save-every", type=int, default=0)
    ap.add_argument("--wire", choices=("packed", "f32"), default="packed",
                    help="host->device transfer wire format (data/wire.py)")
    args = ap.parse_args()

    work = args.workdir or tempfile.mkdtemp(prefix="soak_")
    dumpdir = os.path.join(work, "dump")
    outdir = os.path.join(work, "exp")
    cfg_path = os.path.join(work, "soak.yaml")
    print(f"workdir: {work}", flush=True)
    write_corpus(dumpdir)
    import yaml

    with open(cfg_path, "w") as f:
        yaml.safe_dump(
            soak_config(args.steps, args.eval_every, args.save_every,
                        args.wire), f
        )

    cmd = [
        sys.executable, "-m", "svcc23_fastsvc_tpu.bin.train_fastsvc",
        "--train-dumpdir", dumpdir, "--outdir", outdir,
        "--config", cfg_path, "--verbose", "1",
    ]
    if args.eval_every:
        cmd += ["--dev-dumpdir", dumpdir]

    preempt_info = None
    t0 = time.time()
    if args.preempt_at_s is not None:
        rc, log1, wall1 = run_cli(cmd, preempt_at_s=args.preempt_at_s)
        sys.stderr.write(log1[-2000:])
        if rc != 75:
            raise SystemExit(
                f"preempted trainer exited rc={rc}, expected 75 (graceful "
                "checkpoint-and-exit contract)"
            )
        pre_intervals = parse_intervals(log1)
        m = re.search(r"preempted at step (\d+)", log1)
        preempt_step = int(m.group(1)) if m else None
        t_restart = time.time()
        rc, log2, wall2 = run_cli(cmd + ["--resume"])
        if rc != 0:
            sys.stderr.write(log2[-4000:])
            raise SystemExit(f"resumed trainer failed rc={rc}")
        m = re.search(r"resumed from step (\d+)", log2)
        resume_step = int(m.group(1)) if m else None
        post_intervals = parse_intervals(log2)
        preempt_info = {
            "preempt_step": preempt_step,
            "resume_step": resume_step,
            "restart_to_first_flush_s": _restart_latency_s(log2),
            "restart_wall_s": round(wall2, 1),
            "pre_d_loss_last": (
                pre_intervals[-1].get("discriminator_loss")
                if pre_intervals else None
            ),
            "post_d_loss_first": (
                post_intervals[0].get("discriminator_loss")
                if post_intervals else None
            ),
        }
        intervals = pre_intervals + post_intervals
        log = log1 + log2
        wall = wall1 + wall2
    else:
        rc, log, wall = run_cli(cmd)
        sys.stderr.write(log[-4000:])
        if rc != 0:
            raise SystemExit(f"train CLI failed rc={rc}")
        intervals = parse_intervals(log)

    if len(intervals) < 3:
        raise SystemExit(f"too few log intervals parsed ({len(intervals)})")

    rates = [d["audio_s_per_s"] for d in intervals]
    # interval 1 includes compile; sustained stats exclude it
    sustained = np.asarray(rates[1:])
    p10, p50, p90 = (float(np.percentile(sustained, q)) for q in (10, 50, 90))

    # dip attribution: intervals below 80% of the median, with their waits
    dips = []
    for i, d in enumerate(intervals[1:], start=1):
        if d["audio_s_per_s"] < 0.8 * p50:
            dips.append({
                "interval": i,
                "audio_s_per_s": d["audio_s_per_s"],
                "data_wait_s": d.get("data_wait_s"),
                "step_wait_s": d.get("step_wait_s"),
                "drain_s": d.get("drain_s"),
                "eval_s": d.get("eval_s"),
                "save_s": d.get("save_s"),
            })

    losses = [d["discriminator_loss"] for d in intervals
              if "discriminator_loss" in d]
    lowering = re.search(r"conv lowering: (\S+)", log)
    result = {
        "metric": "cli_sustained_gan_train_audio_s_per_s_per_chip_bf16",
        "value": round(p50, 1),
        "unit": "audio-s/s/chip",
        "steps": args.steps,
        "p10": round(p10, 1),
        "p50": round(p50, 1),
        "p90": round(p90, 1),
        "intervals": intervals,
        "first_interval_includes_compile": True,
        "dips_below_80pct_of_median": dips,
        "preemption_drill": preempt_info,
        "conv_lowering": lowering.group(1) if lowering else None,
        "wire_format": args.wire,
        "final_discriminator_loss": losses[-1] if losses else None,
        "wall_s": round(wall, 1),
        "rate_metric_note": (
            "audio_s_per_s intervals include the log-flush device-queue "
            "drain (train/loop.py round-5 fix) — honest wall throughput; "
            "SOAK_r03.json predates the fix and overstated the rate"
        ),
        "config": f"batch 32 x 1 s @ 24 kHz, [5,4,4,2], bf16, steps_per_call "
                  f"16, native producer 4 threads, full GAN phase, "
                  f"wire_format {args.wire}",
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "intervals"}))


if __name__ == "__main__":
    main()
