"""Benchmark: FastSVC GAN training + synthesis throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio-s/s/chip", "vs_baseline": N, ...}

Baseline anchor (BASELINE.md): the reference trains 600k steps x 32 s of
audio per step in ~2 days on one RTX 3090 ≈ 110 audio-seconds/s sustained
(both GAN phases). vs_baseline = ours / 110.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def build_task(sr: int = 24000):
    """BASELINE.json metric is at 24 kHz: the paper's [5,4,4,2] generator
    (hop 160 at 24 kHz). sr=16000 gives the conf/fastsvc.yaml [2,4,4,5]
    recipe config instead."""
    from svcc23_fastsvc_tpu.losses import MultiResolutionSTFTLoss
    from svcc23_fastsvc_tpu.models.fastsvc import (
        FastSVCGenerator,
        MelGANMultiScaleDiscriminator,
    )
    from svcc23_fastsvc_tpu.ops.signal_gen import SignalGenerator
    from svcc23_fastsvc_tpu.train import FastSVCTrainTask, make_optimizer

    scales = (5, 4, 4, 2) if sr == 24000 else (2, 4, 4, 5)
    generator = FastSVCGenerator(upsampling_scales=scales)
    discriminator = MelGANMultiScaleDiscriminator(  # conf/fastsvc.yaml:35-52
        scales=3, channels=16, max_downsample_channels=512,
        downsample_scales=(4, 4, 4),
    )
    return FastSVCTrainTask(
        generator=generator,
        discriminator=discriminator,
        g_tx=make_optimizer(lr=1e-3, grad_norm=10.0),
        d_tx=make_optimizer(lr=1e-3, grad_norm=1.0),
        signal_generator=SignalGenerator(sample_rate=sr, hop_size=160),
    )


def make_batch(key, B, Tf, hop, in_channels=144, emb=512):
    ks = jax.random.split(key, 4)
    return {
        "ppg": jax.random.normal(ks[0], (B, Tf, in_channels)),
        "f0": jnp.full((B, Tf, 1), 220.0),
        "lft": jax.random.normal(ks[1], (B, Tf * hop, 1)) * 0.1,
        "spk_emb": jax.random.normal(ks[2], (B, emb)),
        "audio": jax.random.normal(ks[3], (B, Tf * hop, 1)) * 0.1,
    }


def time_fn(fn, *args, iters=10, state_arg=None):
    """Median wall time per call; fn may thread a state through."""
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2], out


def main():
    # Reference training shape: batch 32 x 1 s (conf/fastsvc.yaml:71-72),
    # evaluated at 24 kHz per the BASELINE metric (150 frames x hop 160).
    B, sr, hop = 32, 24000, 160
    Tf = sr // hop
    audio_s_per_batch = B * Tf * hop / sr

    task = build_task(sr)
    state = task.init_state(jax.random.PRNGKey(0))
    batch = make_batch(jax.random.PRNGKey(1), B, Tf, hop)

    gen_step, gan_step = task.jit_steps(donate=False)

    # Warmup/compile both phases.
    t0 = time.perf_counter()
    state, _ = gen_step(state, batch)
    jax.block_until_ready(state.g_params)
    gen_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    state, _ = gan_step(state, batch)
    jax.block_until_ready(state.g_params)
    gan_compile = time.perf_counter() - t0

    # Timed GAN-phase steps (the sustained regime: 500k of 600k steps).
    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        state, _m = gan_step(state, batch)
        jax.block_until_ready(state.g_params)
        times.append(time.perf_counter() - t0)
    times.sort()
    step_t = times[len(times) // 2]

    # Sustained regime: K steps per dispatch (lax.scan) amortizes host->device
    # dispatch — the production Trainer uses the same path (steps_per_call).
    from svcc23_fastsvc_tpu.train.gan import make_multi_step

    K = 8
    batches = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[make_batch(jax.random.PRNGKey(100 + i), B, Tf, hop) for i in range(K)],
    )
    multi = jax.jit(make_multi_step(task.gan_step))
    state, m = multi(state, batches)
    jax.block_until_ready(m)
    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        state, m = multi(state, batches)
        jax.block_until_ready(m)
        times.append(time.perf_counter() - t0)
    times.sort()
    scan_step_t = times[len(times) // 2] / K
    train_tput = audio_s_per_batch / scan_step_t

    # Synthesis throughput: folded-weight generator forward, large batch.
    from svcc23_fastsvc_tpu.ops import fold_weight_norm

    g_inf = fold_weight_norm(state.g_params)
    sb, sTf = 64, Tf
    sbatch = make_batch(jax.random.PRNGKey(2), sb, sTf, hop)
    sine = task.signal_generator(sbatch["f0"], jax.random.PRNGKey(3))

    fwd = jax.jit(
        lambda p, ppg, sine, lft, emb: task.generator.apply(p, ppg, sine, lft, emb)
    )
    out = fwd(g_inf, sbatch["ppg"], sine, sbatch["lft"], sbatch["spk_emb"])
    jax.block_until_ready(out)
    syn_t, _ = time_fn(
        fwd, g_inf, sbatch["ppg"], sine, sbatch["lft"], sbatch["spk_emb"], iters=20
    )
    syn_tput = (sb * sTf * hop / sr) / syn_t

    result = {
        "metric": "fastsvc_gan_train_audio_seconds_per_s_per_chip_24khz",
        "value": round(train_tput, 1),
        "unit": "audio-s/s/chip",
        "vs_baseline": round(train_tput / 110.0, 2),
        "synthesis_audio_s_per_s_per_chip": round(syn_tput, 1),
        "gan_step_ms": round(scan_step_t * 1e3, 2),
        "gan_single_dispatch_step_ms": round(step_t * 1e3, 2),
        "batch": B,
        "compile_s": {"gen": round(gen_compile, 1), "gan": round(gan_compile, 1)},
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
