"""Convergence parity: the reference torch Trainer vs this framework,
step for step on identical batches.

Both sides start from the SAME weights (reference torch random init,
converted with svcc23_fastsvc_tpu.compat), consume the SAME precomputed
batch sequence (including the collater-built sine excitation,
reference train_fastsvc.py:545-546 — precomputed here in f64 and fed to
both, noise_amp=0 so the excitation is deterministic), and run the SAME
update rule (scale_by_ref_radam is bit-exact vs harana/optimizers/radam.py,
tests/test_optimizer_parity.py). The reference side drives the REAL
harana.bin.train_fastsvc.Trainer._train_step (the trainer's own gating:
G updates when steps > generator_train_start_steps=0, D and the G
adversarial term when steps > discriminator_train_start_steps).

Outputs per-step loss trajectories for both frameworks, their deltas, and
final-model agreement (parameter drift + mel-L1 between the two final
generators on held-out batches).

Usage:
    python tools/convergence_parity.py --steps 400 --d-start 120 \
        --out CONVERGENCE_r04
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tests"),
)

# ---------------------------------------------------------------------------
# experiment configuration (small but structurally complete: 3 upsample
# blocks exercising FiLM/down chains, MelGAN 2-scale discriminator)
# ---------------------------------------------------------------------------

SR = 16000
HOP = 80
GEN_KW = dict(
    in_channels=16,
    mid_channels=(32, 16, 8),
    upsampling_scales=(4, 4, 5),
    spk_emb_size=32,
    use_spk_emb=True,
)
DISC_KW = dict(
    scales=2, channels=8, max_downsample_channels=128,
    downsample_scales=(4, 4),
)
# 3 resolutions sized for the short 3200-sample window
STFT_RES = dict(
    fft_sizes=(512, 256, 128), hop_sizes=(128, 64, 32),
    win_lengths=(512, 256, 128),
)
LAMBDA_ADV = 2.5
G_LR, D_LR, EPS = 1e-3, 1e-3, 1e-6
G_CLIP, D_CLIP = 10.0, 1.0


def make_batches(n_batches, *, batch_size=4, n_frames=40, seed=0,
                 n_speakers=4, n_distinct=24):
    """Synthetic singing-like corpus as a fixed batch sequence.

    Each utterance: vibrato F0 around a per-speaker base with unvoiced
    gaps, target audio = 3 harmonics with per-speaker amplitudes, ppg =
    smoothed noise + harmonic-amplitude code, lft = frame log-RMS
    upsampled to sample rate. The sine excitation is the reference
    collater's NSF formula (vuv * 0.1 * sin(2pi cumsum((f0/sr) % 1))),
    computed once in f64 and shared verbatim by both frameworks.
    """
    rng = np.random.default_rng(seed)
    B, Tf = batch_size, n_frames
    T = Tf * HOP
    spk_base = rng.uniform(120.0, 280.0, n_speakers)
    spk_amps = rng.uniform(0.05, 0.35, (n_speakers, 3))
    spk_emb = rng.standard_normal((n_speakers, GEN_KW["spk_emb_size"])).astype(
        np.float32
    )

    def smooth(x, k=9):
        # moving-average along time axis 1
        kern = np.ones(k) / k
        return np.apply_along_axis(
            lambda v: np.convolve(v, kern, mode="same"), 1, x
        )

    distinct = []
    for _ in range(n_distinct):
        spk = rng.integers(0, n_speakers, B)
        base = spk_base[spk][:, None]
        vib = 2.0 ** (
            0.03 * np.sin(2 * np.pi * rng.uniform(4, 7, (B, 1))
                          * np.arange(Tf)[None, :] * HOP / SR)
            + 0.1 * smooth(rng.standard_normal((B, Tf)), 15)
        )
        f0 = base * vib  # (B, Tf)
        # one unvoiced gap per utterance
        for b in range(B):
            g0 = rng.integers(0, Tf - 6)
            f0[b, g0: g0 + rng.integers(3, 7)] = 0.0
        f0_up = np.repeat(f0, HOP, axis=1)  # nearest frame->sample
        vuv = (f0_up > 0).astype(np.float64)
        phase = 2 * np.pi * np.cumsum((f0_up / SR) % 1.0, axis=1)
        sine = vuv * 0.1 * np.sin(phase)
        amps = spk_amps[spk]  # (B, 3)
        audio = sum(
            amps[:, k - 1: k] * np.sin(k * phase) for k in (1, 2, 3)
        ) * vuv + 0.005 * rng.standard_normal((B, T))
        rms = np.sqrt(
            np.mean(audio.reshape(B, Tf, HOP) ** 2, axis=2) + 1e-8
        )
        lft = np.repeat(np.log(rms), HOP, axis=1)
        ppg = smooth(rng.standard_normal((B, Tf, GEN_KW["in_channels"])), 7)
        ppg[:, :, :3] += amps[:, None, :]
        ppg[:, :, 3] += np.log(np.maximum(f0, 1.0)) / 5.0
        distinct.append({
            "ppg": ppg.astype(np.float32),
            "f0": f0[:, :, None].astype(np.float32),
            "sine": sine[:, :, None].astype(np.float32),
            "lft": lft[:, :, None].astype(np.float32),
            "spk_emb": spk_emb[spk],
            "audio": audio[:, :, None].astype(np.float32),
        })
    return [distinct[i % n_distinct] for i in range(n_batches)]


# ---------------------------------------------------------------------------
# reference (torch) side
# ---------------------------------------------------------------------------


def build_reference(seed=0):
    """Reference G/D with torch random init (the weights both sides use)."""
    import torch

    from harana.models.fastsvc import (
        FastSVCGenerator as RefGen,
        MelGANMultiScaleDiscriminator as RefMSD,
    )

    torch.manual_seed(seed)
    gen = RefGen(
        in_channels=GEN_KW["in_channels"],
        mid_channels=list(GEN_KW["mid_channels"]),
        upsampling_scales=list(GEN_KW["upsampling_scales"]),
        spk_emb_size=GEN_KW["spk_emb_size"],
        use_spk_emb=GEN_KW["use_spk_emb"],
    )
    dis = RefMSD(
        in_channels=1, out_channels=1, scales=DISC_KW["scales"],
        kernel_sizes=[5, 3], channels=DISC_KW["channels"],
        max_downsample_channels=DISC_KW["max_downsample_channels"],
        downsample_scales=list(DISC_KW["downsample_scales"]),
    )
    return gen, dis


def run_reference(batches, *, d_start, outdir, gen, dis, max_steps):
    """Drive the REAL reference Trainer step over the batch sequence.

    Returns per-step dict lists (entry i = losses recorded while processing
    batches[i] at trainer.steps == i; the trainer's own gating decides what
    trains)."""
    import torch

    from harana.bin.train_fastsvc import Trainer
    from harana.losses import (
        DiscriminatorAdversarialLoss,
        GeneratorAdversarialLoss,
        MultiResolutionSTFTLoss as RefStft,
    )
    from harana.optimizers.radam import RAdam

    config = {
        "outdir": outdir,
        "train_max_steps": max_steps,
        "discriminator_train_start_steps": d_start,
        "use_stft_loss": True,
        "lambda_aux": 1.0,
        "lambda_adv": LAMBDA_ADV,
        "generator_grad_norm": G_CLIP,
        "discriminator_grad_norm": D_CLIP,
        "log_interval_steps": 10 ** 9,
        "eval_interval_steps": 10 ** 9,
        "save_interval_steps": 10 ** 9,
    }
    criterion = {
        "stft": RefStft(
            fft_sizes=list(STFT_RES["fft_sizes"]),
            hop_sizes=list(STFT_RES["hop_sizes"]),
            win_lengths=list(STFT_RES["win_lengths"]),
        ),
        "gen_adv": GeneratorAdversarialLoss(average_by_discriminators=True),
        "dis_adv": DiscriminatorAdversarialLoss(average_by_discriminators=True),
    }
    optimizer = {
        "generator": RAdam(gen.parameters(), lr=G_LR, eps=EPS),
        "discriminator": RAdam(dis.parameters(), lr=D_LR, eps=EPS),
    }
    scheduler = {
        "generator": torch.optim.lr_scheduler.StepLR(
            optimizer["generator"], step_size=100000, gamma=0.5
        ),
        "discriminator": torch.optim.lr_scheduler.StepLR(
            optimizer["discriminator"], step_size=100000, gamma=0.5
        ),
    }
    trainer = Trainer(
        steps=0, epochs=0,
        data_loader={"train": None, "dev": None}, sampler=None,
        model={"generator": gen, "discriminator": dis},
        criterion=criterion, optimizer=optimizer, scheduler=scheduler,
        config=config, device=torch.device("cpu"),
    )

    class _NoTqdm:
        def update(self, n):  # pragma: no cover - trivial
            pass

    trainer.tqdm = _NoTqdm()

    series = []
    prev = {}
    for batch in batches:
        x = (
            torch.from_numpy(np.moveaxis(batch["ppg"], 2, 1)),
            torch.from_numpy(np.moveaxis(batch["sine"], 2, 1)),
            torch.from_numpy(np.moveaxis(batch["lft"], 2, 1)),
            torch.from_numpy(batch["spk_emb"]),
        )
        y = torch.from_numpy(np.moveaxis(batch["audio"], 2, 1))
        trainer._train_step((x, y))
        cur = {k: float(v) for k, v in trainer.total_train_loss.items()}
        series.append({
            k.replace("train/", ""): cur[k] - prev.get(k, 0.0) for k in cur
        })
        prev = cur
    return series


# ---------------------------------------------------------------------------
# jax side
# ---------------------------------------------------------------------------


def build_jax_task():
    from svcc23_fastsvc_tpu.losses import MultiResolutionSTFTLoss
    from svcc23_fastsvc_tpu.models.fastsvc import (
        FastSVCGenerator,
        MelGANMultiScaleDiscriminator,
    )
    from svcc23_fastsvc_tpu.ops.signal_gen import SignalGenerator
    from svcc23_fastsvc_tpu.train import FastSVCTrainTask, make_optimizer

    return FastSVCTrainTask(
        generator=FastSVCGenerator(**GEN_KW),
        discriminator=MelGANMultiScaleDiscriminator(**DISC_KW),
        g_tx=make_optimizer(lr=G_LR, eps=EPS, grad_norm=G_CLIP),
        d_tx=make_optimizer(lr=D_LR, eps=EPS, grad_norm=D_CLIP),
        signal_generator=SignalGenerator(
            sample_rate=SR, hop_size=HOP, noise_amp=0.0
        ),
        stft_loss=MultiResolutionSTFTLoss(**STFT_RES),
        lambda_adv=LAMBDA_ADV,
        fuse_film_inference=False,  # keep op order == reference plain fwd
    )


def init_jax_state_from_reference(task, gen, dis):
    import jax
    import jax.numpy as jnp

    from svcc23_fastsvc_tpu.compat import (
        convert_fastsvc_generator,
        convert_melgan_msd,
    )
    from svcc23_fastsvc_tpu.train.state import GANTrainState

    # np.array(copy=True) is load-bearing: on the CPU backend jnp.asarray
    # can be ZERO-COPY over the numpy views of live torch tensors, and the
    # torch optimizer then mutates the "initial" jax params in place.
    copy = lambda t: jax.tree.map(  # noqa: E731
        lambda x: jnp.asarray(np.array(x, copy=True)), t
    )
    g_params = copy(convert_fastsvc_generator(gen.state_dict()))
    d_params = copy(
        convert_melgan_msd(dis.state_dict(), scales=DISC_KW["scales"])
    )
    return GANTrainState.create(
        g_params=g_params, d_params=d_params,
        g_tx=task.g_tx, d_tx=task.d_tx, rng=jax.random.PRNGKey(0),
    )


def run_jax(batches, *, d_start, task, state):
    """Mirror the reference trainer gating: at batch index i (== trainer
    steps), G updates iff i > 0, D + adversarial iff i > d_start."""
    import jax

    gen_step = jax.jit(task.gen_step)
    gan_step = jax.jit(task.gan_step)
    series = []
    for i, batch in enumerate(batches):
        if i == 0:
            series.append({})  # reference's no-op first step
            continue
        b = {k: np.asarray(v) for k, v in batch.items()}
        if i > d_start:
            state, metrics = gan_step(state, b)
        else:
            state, metrics = gen_step(state, b)
        series.append(
            {k: float(v) for k, v in jax.device_get(metrics).items()}
        )
    return series, state


# ---------------------------------------------------------------------------
# comparison
# ---------------------------------------------------------------------------

KEYS = (
    "spectral_convergence_loss", "log_stft_magnitude_loss", "generator_loss",
    "adversarial_loss", "real_loss", "fake_loss", "discriminator_loss",
)


def compare_series(ref_series, jax_series):
    per_key = {}
    for k in KEYS:
        pairs = [
            (i, r[k], j[k])
            for i, (r, j) in enumerate(zip(ref_series, jax_series))
            if k in r and k in j
        ]
        if not pairs:
            continue
        idx = [p[0] for p in pairs]
        rv = np.array([p[1] for p in pairs])
        jv = np.array([p[2] for p in pairs])
        rel = np.abs(rv - jv) / np.maximum(np.abs(rv), 1e-8)
        n = len(rv)
        tail = slice(max(0, n - 100), n)
        per_key[k] = {
            "n_steps": n,
            "first_step": idx[0],
            "rel_diff_first20_max": float(rel[:20].max()),
            "rel_diff_median": float(np.median(rel)),
            "rel_diff_p90": float(np.percentile(rel, 90)),
            "ref_tail100_mean": float(rv[tail].mean()),
            "jax_tail100_mean": float(jv[tail].mean()),
            "tail100_mean_rel_diff": float(
                abs(rv[tail].mean() - jv[tail].mean())
                / max(abs(rv[tail].mean()), 1e-8)
            ),
            "ref_first": float(rv[0]),
            "jax_first": float(jv[0]),
        }
    return per_key


def final_model_agreement(task, state, gen, batches):
    """Parameter drift + mel-L1 between the two FINAL generators."""
    import jax
    import jax.numpy as jnp
    import torch

    from svcc23_fastsvc_tpu.compat import convert_fastsvc_generator
    from svcc23_fastsvc_tpu.ops.stft import mel_filterbank, stft_magnitude

    ref_final = convert_fastsvc_generator(gen.state_dict())
    ours = jax.device_get(state.g_params)
    fa = {
        jax.tree_util.keystr(kp): leaf
        for kp, leaf in jax.tree_util.tree_flatten_with_path(ref_final)[0]
    }
    fb = {
        jax.tree_util.keystr(kp): leaf
        for kp, leaf in jax.tree_util.tree_flatten_with_path(ours)[0]
    }
    assert fa.keys() == fb.keys()
    drifts = []
    for k in fa:
        a, b = np.asarray(fa[k]), np.asarray(fb[k])
        scale = max(float(np.abs(a).max()), 1e-8)
        drifts.append(float(np.abs(a - b).max()) / scale)
    param_drift = float(np.max(drifts))

    # mel-L1 of generated audio: ref-final vs jax-final generator, and each
    # vs the target, on the first 4 distinct batches
    mels = {"ref": [], "jax": [], "tgt": []}
    fwd = jax.jit(task.generator.apply)
    fb = mel_filterbank(SR, 512, 40)

    def mel(y):
        mag = stft_magnitude(jnp.asarray(y, jnp.float32), 512, 128, 512)
        return np.asarray(jnp.log(jnp.maximum(mag @ fb, 1e-5)))
    for batch in batches[:4]:
        with torch.no_grad():
            y_ref = gen(
                torch.from_numpy(np.moveaxis(batch["ppg"], 2, 1)),
                torch.from_numpy(np.moveaxis(batch["sine"], 2, 1)),
                torch.from_numpy(np.moveaxis(batch["lft"], 2, 1)),
                torch.from_numpy(batch["spk_emb"]),
            ).numpy()[:, 0, :]
        y_jax = np.asarray(fwd(
            state.g_params, jnp.asarray(batch["ppg"]),
            jnp.asarray(batch["sine"]), jnp.asarray(batch["lft"]),
            jnp.asarray(batch["spk_emb"]),
        ))[:, :, 0]
        mels["ref"].append(mel(y_ref))
        mels["jax"].append(mel(y_jax))
        mels["tgt"].append(mel(batch["audio"][:, :, 0]))
    l1 = lambda a, b: float(  # noqa: E731
        np.mean([np.abs(x - y).mean() for x, y in zip(a, b)])
    )
    return {
        "final_param_max_rel_drift": param_drift,
        "mel_l1_ref_vs_jax": l1(mels["ref"], mels["jax"]),
        "mel_l1_ref_vs_target": l1(mels["ref"], mels["tgt"]),
        "mel_l1_jax_vs_target": l1(mels["jax"], mels["tgt"]),
    }


def run_experiment(steps=400, d_start=120, seed=0, batch_size=4,
                   n_frames=40):
    """Full experiment; returns (summary_dict, ref_series, jax_series)."""
    from conftest import make_reference_importable

    if not make_reference_importable():
        raise RuntimeError("reference tree not available")

    batches = make_batches(steps + 1, batch_size=batch_size,
                           n_frames=n_frames, seed=seed)
    gen, dis = build_reference(seed=seed)
    task = build_jax_task()
    state = init_jax_state_from_reference(task, gen, dis)

    t0 = time.time()
    with tempfile.TemporaryDirectory() as td:
        ref_series = run_reference(
            batches, d_start=d_start, outdir=td, gen=gen, dis=dis,
            max_steps=steps + 1,
        )
    t_ref = time.time() - t0
    t0 = time.time()
    jax_series, state = run_jax(batches, d_start=d_start, task=task,
                                state=state)
    t_jax = time.time() - t0

    summary = {
        "config": {
            "steps": steps, "d_start": d_start, "batch_size": batch_size,
            "n_frames": n_frames, "hop": HOP, "sr": SR, "seed": seed,
            "generator": GEN_KW, "discriminator": DISC_KW,
            "stft_resolutions": STFT_RES,
            "lr": G_LR, "eps": EPS, "clip": [G_CLIP, D_CLIP],
            "lambda_adv": LAMBDA_ADV, "noise_amp": 0.0,
        },
        "per_loss": compare_series(ref_series, jax_series),
        "final": final_model_agreement(task, state, gen, batches),
        "wall_s": {"reference_torch_cpu": round(t_ref, 1),
                   "jax": round(t_jax, 1)},
    }
    return summary, ref_series, jax_series


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--d-start", type=int, default=120)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--n-frames", type=int, default=40)
    ap.add_argument("--out", default="CONVERGENCE_r04")
    args = ap.parse_args()

    # CPU backend: the experiment is a numerics comparison, and the torch
    # side is CPU-only here anyway
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

    summary, ref_series, jax_series = run_experiment(
        steps=args.steps, d_start=args.d_start, seed=args.seed,
        batch_size=args.batch_size, n_frames=args.n_frames,
    )
    out = dict(summary)
    out["series"] = {
        "reference": ref_series,
        "jax": jax_series,
    }
    with open(args.out + ".json", "w") as f:
        json.dump(out, f)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
