"""B02 convergence parity: the reference torch train_b02 Trainer vs this
framework's B02TrainTask, step for step on identical batches.

Companion to tools/convergence_parity.py (FastSVC); same method applied to
the second recipe. Both sides start from the SAME weights (reference torch
random init, converted with svcc23_fastsvc_tpu.compat), consume the SAME
precomputed batch sequence, and run the SAME update rule (scale_by_ref_radam
with the reference's taco2_hubertsoft.yaml hyperparameters: G lr 1e-4 /
clip 1 / StepLR 4000x0.5, D lr 2e-4 / clip 10, lambda_l1 1.0,
lambda_adv 2.5). The reference side drives the REAL
harana.bin.train_b02.Trainer._train_step, including its quirks: the
generator's adversarial term is computed on a DETACHED prediction
(train_b02.py:201 — zero gradient to G), and the discriminator retrains on
a freshly regenerated prediction after the G update (train_b02.py:225-233).

Stochasticity is pinned, not papered over:
  * every dropout is disabled (ctor rates 0 on both sides + a torch
    nn.Dropout sweep for the encoder/bap modules whose rates the reference
    ctor does not expose; enc_dropout_rate=0 on ours) — dropout is the only
    per-step noise in this trainer;
  * the discriminator's random 50-frame window (train_b02 slice_dataset,
    tacotron2.py:708-726) is made deterministic by construction: every
    utterance has exactly batch_max_frames+1 frames, so the reference's
    np.random.randint(0, 1) and our (u * max_start).astype(int32) both
    pin the window start to 0.

With those pinned, the remaining update is deterministic on both sides
(teacher-forced AR scan, batch-stat BN on identical batches, masked MSE,
LSGAN, RAdam) and the trajectories must track to f32 tolerance.

Usage:
    python tools/convergence_parity_b02.py --steps 400 --d-start 120 \
        --out CONVERGENCE_B02_r04
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
# experiment configuration. input_dim MUST be 256: the reference bap decoder
# hardcodes its input width to 258 = input_dim + logf0 + lft
# (tacotron2.py:471). output_dim MUST be 60 (+3 bap): the discriminator's
# frequency unfold (size 30, step 15 -> 3 bands) needs 63 channels.
# hidden_dim is free; small keeps the torch CPU side fast.
# ---------------------------------------------------------------------------

GEN_KW = dict(
    input_dim=256,
    output_dim=60,
    hidden_dim=64,
    enc_layers=1,
    dec_layers=2,
    multi_speaker=True,
    spk_emb_dim=24,
    integrate_logf0=True,
    use_postnet=False,
    ar_mode=True,
)
BATCH_MAX_FRAMES = 40  # discriminator window; utterances are +1 frame long
N_FRAMES = BATCH_MAX_FRAMES + 1
# taco2_hubertsoft.yaml:68-91
G_LR, D_LR, EPS = 1e-4, 2e-4, 1e-6
G_CLIP, D_CLIP = 1.0, 10.0
G_SCHED_STEP, SCHED_GAMMA = 4000, 0.5
LAMBDA_L1, LAMBDA_ADV = 1.0, 2.5


def make_batches(n_batches, *, batch_size=4, seed=0, n_speakers=4,
                 n_distinct=24):
    """Synthetic acoustic-model corpus as a fixed batch sequence.

    ppg: smoothed noise (B, T, 256); targets: a fixed random projection of
    the ppg plus per-speaker offsets and an f0-correlated component, so the
    mapping is learnable; lft/logf0 at frame rate. All lengths are exactly
    N_FRAMES (see module docstring: this pins the discriminator window)."""
    rng = np.random.default_rng(seed)
    B, Tf = batch_size, N_FRAMES
    D_in, D_out = GEN_KW["input_dim"], GEN_KW["output_dim"] + 3
    proj = rng.standard_normal((D_in, D_out)) / np.sqrt(D_in)
    spk_base = rng.uniform(120.0, 280.0, n_speakers)
    spk_off = 0.3 * rng.standard_normal((n_speakers, D_out))
    spk_emb = rng.standard_normal(
        (n_speakers, GEN_KW["spk_emb_dim"])).astype(np.float32)

    def smooth(x, k=7):
        kern = np.ones(k) / k
        return np.apply_along_axis(
            lambda v: np.convolve(v, kern, mode="same"), 1, x)

    distinct = []
    for _ in range(n_distinct):
        spk = rng.integers(0, n_speakers, B)
        f0 = spk_base[spk][:, None] * (
            1.0 + 0.03 * np.sin(2 * np.pi * rng.uniform(4, 7, (B, 1))
                                * np.arange(Tf)[None, :] / Tf)
        )
        logf0 = np.log(f0)
        ppg = smooth(rng.standard_normal((B, Tf, D_in)), 7)
        lft = smooth(-2.0 + 0.5 * rng.standard_normal((B, Tf)), 9)
        targets = (
            np.tanh(ppg @ proj)
            + spk_off[spk][:, None, :]
            + 0.1 * np.sin(logf0)[:, :, None]
        )
        distinct.append({
            "ppg": ppg.astype(np.float32),
            "lf0": logf0[:, :, None].astype(np.float32),
            "lft": lft[:, :, None].astype(np.float32),
            "spk_emb": spk_emb[spk],
            "targets": targets.astype(np.float32),
            "lengths": np.full((B,), Tf, np.int32),
        })
    return [distinct[i % n_distinct] for i in range(n_batches)]


# ---------------------------------------------------------------------------
# reference (torch) side
# ---------------------------------------------------------------------------


def build_reference(seed=0):
    """Reference G/D with torch random init; all dropout disabled."""
    import torch

    from harana.models.tacotron2 import (
        MultiSubFreqDiscriminator as RefMSFD,
        Tacotron2 as RefT2,
    )

    torch.manual_seed(seed)
    gen = RefT2(
        **{k: v for k, v in GEN_KW.items()},
        prenet_dropout_rate=0.0,
        dec_dropout_rate=0.0,
    )
    dis = RefMSFD(batch_max_frames=BATCH_MAX_FRAMES)
    # the encoder (0.5) and bap (0.2) dropout rates are not ctor-exposed
    for m in gen.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    return gen, dis


def run_reference(batches, *, d_start, outdir, gen, dis, max_steps):
    """Drive the REAL reference train_b02 Trainer over the batch sequence."""
    import torch

    from harana.bin.train_b02 import Trainer
    from harana.losses import (
        DiscriminatorAdversarialLoss,
        GeneratorAdversarialLoss,
        MSELoss as RefMSE,
    )
    from harana.optimizers.radam import RAdam

    config = {
        "outdir": outdir,
        "train_max_steps": max_steps,
        "discriminator_train_start_steps": d_start,
        "lambda_l1": LAMBDA_L1,
        "lambda_adv": LAMBDA_ADV,
        "generator_grad_norm": G_CLIP,
        "discriminator_grad_norm": D_CLIP,
        "log_interval_steps": 10 ** 9,
        "eval_interval_steps": 10 ** 9,
        "save_interval_steps": 10 ** 9,
    }
    mse = RefMSE()
    criterion = {
        # the reference forward defaults device="cuda" for its mask move
        # (mse_loss.py:23); pin it to cpu for this run
        "mse_loss": lambda x, y, xl, yl: mse(x, y, xl, yl, device="cpu"),
        "gen_adv": GeneratorAdversarialLoss(average_by_discriminators=True),
        "dis_adv": DiscriminatorAdversarialLoss(
            average_by_discriminators=True),
    }
    optimizer = {
        "generator": RAdam(gen.parameters(), lr=G_LR, eps=EPS),
        "discriminator": RAdam(dis.parameters(), lr=D_LR, eps=EPS),
    }
    scheduler = {
        "generator": torch.optim.lr_scheduler.StepLR(
            optimizer["generator"], step_size=G_SCHED_STEP,
            gamma=SCHED_GAMMA),
        "discriminator": torch.optim.lr_scheduler.StepLR(
            optimizer["discriminator"], step_size=100000, gamma=SCHED_GAMMA),
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
            torch.from_numpy(batch["ppg"]),
            torch.from_numpy(batch["lengths"].astype(np.int64)),
            torch.from_numpy(batch["lft"]),
            torch.from_numpy(batch["lf0"]),
            torch.from_numpy(batch["spk_emb"][:, :, None]),
        )
        y = (
            torch.from_numpy(batch["targets"]),
            torch.from_numpy(batch["lengths"].astype(np.int64)),
        )
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
    from svcc23_fastsvc_tpu.models.tacotron2 import (
        MultiSubFreqDiscriminator,
        Tacotron2,
    )
    from svcc23_fastsvc_tpu.train import make_optimizer
    from svcc23_fastsvc_tpu.train.b02 import B02TrainTask

    gen_kw = {k: v for k, v in GEN_KW.items()
              if k not in ("enc_layers", "ar_mode")}
    return B02TrainTask(
        generator=Tacotron2(
            **gen_kw,
            prenet_dropout_rate=0.0,
            dec_dropout_rate=0.0,
            enc_dropout_rate=0.0,
        ),
        discriminator=MultiSubFreqDiscriminator(
            batch_max_frames=BATCH_MAX_FRAMES),
        g_tx=make_optimizer(lr=G_LR, eps=EPS, grad_norm=G_CLIP,
                            scheduler_step_size=G_SCHED_STEP,
                            scheduler_gamma=SCHED_GAMMA),
        d_tx=make_optimizer(lr=D_LR, eps=EPS, grad_norm=D_CLIP,
                            scheduler_step_size=100000,
                            scheduler_gamma=SCHED_GAMMA),
        lambda_l1=LAMBDA_L1,
        lambda_adv=LAMBDA_ADV,
    )


def init_jax_state_from_reference(task, gen, dis):
    import jax
    import jax.numpy as jnp

    from svcc23_fastsvc_tpu.compat import (
        convert_subfreq_discriminator,
        convert_tacotron2,
    )

    # copy=True is load-bearing (see convergence_parity.py): zero-copy numpy
    # views of live torch tensors would be mutated by the torch optimizer
    copy = lambda t: jax.tree.map(  # noqa: E731
        lambda x: jnp.asarray(np.array(x, copy=True)), t
    )
    g_params = copy(convert_tacotron2(gen.state_dict()))
    d_params = copy(convert_subfreq_discriminator(dis.state_dict()))
    state = task.init_state(jax.random.PRNGKey(0))
    return state.replace(
        g_params=g_params,
        d_params=d_params,
        g_opt_state=task.g_tx.init(g_params),
        d_opt_state=task.d_tx.init(d_params),
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
    "mse_loss", "generator_loss", "adversarial_loss",
    "real_loss", "fake_loss", "discriminator_loss",
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
    """Parameter drift + teacher-forced feature L1 between the two FINAL
    generators (train-mode batch-stat BN on both sides, dropout disabled,
    so the comparison is deterministic and running-stat-free)."""
    import jax
    import jax.numpy as jnp
    import torch

    from svcc23_fastsvc_tpu.compat import convert_tacotron2

    ref_final = convert_tacotron2(gen.state_dict())
    # overlay our running bn stats (they live in state.g_bn, not g_params);
    # torch's are updated in place inside its state_dict
    ours = jax.device_get(task._apply_bn(state.g_params, state.g_bn))
    fa = {
        jax.tree_util.keystr(kp): leaf
        for kp, leaf in jax.tree_util.tree_flatten_with_path(ref_final)[0]
    }
    fb = {
        jax.tree_util.keystr(kp): leaf
        for kp, leaf in jax.tree_util.tree_flatten_with_path(ours)[0]
    }
    assert fa.keys() == fb.keys()
    drifts, bn_drifts = [], []
    for k in fa:
        a, b = np.asarray(fa[k]), np.asarray(fb[k])
        scale = max(float(np.abs(a).max()), 1e-8)
        d = float(np.abs(a - b).max()) / scale
        # bn running stats are reported separately from trained weights:
        # the reference updates them TWICE per GAN step (forward + the
        # regenerate-for-D forward, train_b02.py:225-233) and gan_step
        # (train/b02.py) chains the BN update twice to replicate that
        # exactly, so their drift is asserted small too (tests) — just
        # under its own key, since stats accumulate differently from
        # gradient-updated leaves
        if k.endswith("['mean']") or k.endswith("['var']"):
            bn_drifts.append(d)
        else:
            drifts.append(d)
    param_drift = float(np.max(drifts))
    bn_drift = float(np.max(bn_drifts)) if bn_drifts else 0.0

    feats = {"ref": [], "jax": [], "tgt": []}
    gen.train()
    for batch in batches[:4]:
        with torch.no_grad():
            y_ref, _ = gen(
                torch.from_numpy(batch["ppg"]),
                torch.from_numpy(batch["lengths"].astype(np.int64)),
                torch.from_numpy(batch["lft"]),
                torch.from_numpy(batch["lf0"]),
                torch.from_numpy(batch["spk_emb"][:, :, None]),
                torch.from_numpy(batch["targets"]),
            )
        y_jax, _, _ = task.generator.apply(
            state.g_params,
            jnp.asarray(batch["ppg"]),
            jnp.asarray(batch["lengths"]),
            jnp.asarray(batch["lft"]),
            jnp.asarray(batch["lf0"]),
            jnp.asarray(batch["spk_emb"]),
            jnp.asarray(batch["targets"]),
            train=True, key=None,
        )
        feats["ref"].append(y_ref.numpy())
        feats["jax"].append(np.asarray(y_jax))
        feats["tgt"].append(batch["targets"])
    l1 = lambda a, b: float(  # noqa: E731
        np.mean([np.abs(x - y).mean() for x, y in zip(a, b)])
    )
    return {
        "final_param_max_rel_drift": param_drift,
        "final_bn_running_stat_max_rel_drift": bn_drift,
        "feat_l1_ref_vs_jax": l1(feats["ref"], feats["jax"]),
        "feat_l1_ref_vs_target": l1(feats["ref"], feats["tgt"]),
        "feat_l1_jax_vs_target": l1(feats["jax"], feats["tgt"]),
    }


def run_experiment(steps=400, d_start=120, seed=0, batch_size=4):
    from conftest import make_reference_importable

    if not make_reference_importable():
        raise RuntimeError("reference tree not available")

    batches = make_batches(steps + 1, batch_size=batch_size, seed=seed)
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
            "n_frames": N_FRAMES, "seed": seed,
            "generator": GEN_KW,
            "batch_max_frames": BATCH_MAX_FRAMES,
            "lr": [G_LR, D_LR], "eps": EPS, "clip": [G_CLIP, D_CLIP],
            "g_scheduler": [G_SCHED_STEP, SCHED_GAMMA],
            "lambda_l1": LAMBDA_L1, "lambda_adv": LAMBDA_ADV,
            "dropout": "disabled on both sides (the only per-step noise)",
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
    ap.add_argument("--out", default="CONVERGENCE_B02_r04")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

    summary, ref_series, jax_series = run_experiment(
        steps=args.steps, d_start=args.d_start, seed=args.seed,
        batch_size=args.batch_size,
    )
    out = dict(summary)
    out["series"] = {"reference": ref_series, "jax": jax_series}
    with open(args.out + ".json", "w") as f:
        json.dump(out, f)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
