"""CLI-sustained throughput certification (VERDICT r2 next #4).

bench.py times the jitted step on a pre-staged device batch; this tool
certifies that the REAL training CLI — HDF5 dataset, native producer ring,
prefetch, scanned dispatch, checkpointing — sustains a comparable rate.
It builds a synthetic 24 kHz feature corpus, runs
`python -m svcc23_fastsvc_tpu.bin.train_fastsvc` at the production bench
shape (batch 32 x 1 s, [5,4,4,2] generator, bf16 compute, steps_per_call
16, full GAN phase), parses the loop's own per-interval audio_s_per_s log
lines (train/loop.py _flush_logs), and writes SOAK_r{N}.json with the
per-interval rates and the median sustained number.

Usage: python tools/soak_cli.py [--steps 5000] [--out SOAK_r03.json]
"""

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 24000
HOP = 160


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
        path = os.path.join(dumpdir, f"utt{i:04d}.h5")
        write_hdf5(path, "wave", wave.astype(np.float32))
        write_hdf5(path, "f0", f0_curve[::HOP][:F].astype(np.float32))
        write_hdf5(path, "ppg", rng.standard_normal((F, 144)).astype(np.float32))
        write_hdf5(path, "lft",
                   (0.1 * rng.standard_normal(T)).astype(np.float32))
        write_hdf5(path, "spk_emb",
                   rng.standard_normal(512).astype(np.float32))


def soak_config(steps: int) -> dict:
    return {
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
        "eval_interval_steps": 10 * steps,
        "save_interval_steps": 10 * steps,
        "compute_dtype": "bfloat16",
        "steps_per_call": 16,
        "loader_threads": 4,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--out", default="SOAK_r03.json")
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    work = args.workdir or tempfile.mkdtemp(prefix="soak_")
    dumpdir = os.path.join(work, "dump")
    outdir = os.path.join(work, "exp")
    cfg_path = os.path.join(work, "soak.yaml")
    print(f"workdir: {work}", flush=True)
    write_corpus(dumpdir)
    import yaml

    with open(cfg_path, "w") as f:
        yaml.safe_dump(soak_config(args.steps), f)

    cmd = [
        sys.executable, "-m", "svcc23_fastsvc_tpu.bin.train_fastsvc",
        "--train-dumpdir", dumpdir, "--outdir", outdir,
        "--config", cfg_path, "--verbose", "1",
    ]
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True,
                          cwd=os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))))
    wall = time.time() - t0
    log = proc.stdout + proc.stderr
    sys.stderr.write(log[-4000:])
    if proc.returncode != 0:
        raise SystemExit(f"train CLI failed rc={proc.returncode}")

    rates = [float(m) for m in re.findall(r"audio_s_per_s=([0-9.]+)", log)]
    losses = [float(m) for m in
              re.findall(r"discriminator_loss=([0-9.]+)", log)]
    if len(rates) < 3:
        raise SystemExit(f"too few log intervals parsed ({len(rates)})")
    # interval 1 includes compile; sustained = median of the rest
    sustained = float(np.median(rates[1:]))
    lowering = re.search(r"conv lowering: (\S+)", log)
    result = {
        "metric": "cli_sustained_gan_train_audio_s_per_s_per_chip_bf16",
        "value": round(sustained, 1),
        "unit": "audio-s/s/chip",
        "steps": args.steps,
        "intervals_audio_s_per_s": [round(r, 1) for r in rates],
        "first_interval_includes_compile": True,
        "conv_lowering": lowering.group(1) if lowering else None,
        "final_discriminator_loss": losses[-1] if losses else None,
        "wall_s": round(wall, 1),
        "config": "batch 32 x 1 s @ 24 kHz, [5,4,4,2], bf16, steps_per_call "
                  "16, native producer 4 threads, full GAN phase",
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
