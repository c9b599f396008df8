"""YAML experiment config: load, merge overrides, build objects.

Keeps the reference's config surface (egs/svcc23/fastsvc1/conf/fastsvc.yaml)
— same keys select the same behaviors — but replaces getattr-reflection
model resolution (/root/reference/harana/bin/train_fastsvc.py:700-776) with
explicit factories. The merged config is dumped into the experiment dir as
config.yml, which decode later reads back (same serialized contract as the
reference, train_fastsvc.py:636-641).
"""

from __future__ import annotations

import copy
import os
from typing import Any, Dict, Optional

import yaml


DEFAULTS: Dict[str, Any] = {
    "sampling_rate": 16000,
    "hop_size": 160,
    "lft_hop_size": 64,
    "shiftms": 10,
    "generator_type": "FastSVCGenerator",
    "generator_params": {},
    "discriminator_type": "MelGANMultiScaleDiscriminator",
    "discriminator_params": {},
    "stft_loss_params": {
        "fft_sizes": [2048, 1024, 512, 256, 128, 64],
        "hop_sizes": [512, 256, 128, 64, 32, 16],
        "win_lengths": [2048, 1024, 512, 256, 128, 64],
    },
    "use_stft_loss": True,
    "lambda_aux": 1.0,
    "lambda_adv": 2.5,
    "batch_size": 32,
    "batch_length": 16000,
    "signal_generator": {
        "sine_amp": 0.1,
        "noise_amp": 0.003,
        "signal_types": ["sine"],
    },
    "aux_context_window": 0,
    "generator_optimizer_params": {"lr": 1e-3, "eps": 1e-6, "weight_decay": 0.0},
    "generator_scheduler_params": {"step_size": 100000, "gamma": 0.5},
    "generator_grad_norm": 10,
    "discriminator_optimizer_params": {"lr": 1e-3, "eps": 1e-6, "weight_decay": 0.0},
    "discriminator_scheduler_params": {"step_size": 100000, "gamma": 0.5},
    "discriminator_grad_norm": 1,
    "generator_train_start_steps": 0,
    "discriminator_train_start_steps": 100000,
    "train_max_steps": 600000,
    "save_interval_steps": 50000,
    "eval_interval_steps": 5000,
    "log_interval_steps": 5000,
}


def load_config(path: Optional[str] = None, overrides: Optional[dict] = None) -> dict:
    cfg = copy.deepcopy(DEFAULTS)
    if path:
        with open(path) as f:
            user = yaml.safe_load(f) or {}
        cfg.update(user)
    if overrides:
        cfg.update({k: v for k, v in overrides.items() if v is not None})
    return cfg


def dump_config(cfg: dict, outdir: str):
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, "config.yml"), "w") as f:
        yaml.safe_dump(cfg, f)


# ---------------------------------------------------------------------------
# factories
# ---------------------------------------------------------------------------


def build_generator(cfg: dict):
    from .models.fastsvc import FastSVCGenerator

    gtype = cfg.get("generator_type", "FastSVCGenerator")
    params = dict(cfg.get("generator_params", {}))
    if gtype == "FastSVCGenerator":
        kw = {}
        for k in ("in_channels", "out_channels", "spk_emb_size", "use_spk_emb"):
            if k in params:
                kw[k] = params[k]
        for k in ("mid_channels", "upsampling_scales"):
            if k in params:
                kw[k] = tuple(params[k])
        return FastSVCGenerator(**kw)
    raise KeyError(f"unknown generator_type {gtype!r}")


def build_discriminator(cfg: dict):
    from .models.fastsvc import (
        HiFiGANMultiScaleMultiPeriodDiscriminator,
        MelGANMultiScaleDiscriminator,
    )

    dtype = cfg.get("discriminator_type", "MelGANMultiScaleDiscriminator")
    params = cfg.get("discriminator_params", {})
    if dtype == "MelGANMultiScaleDiscriminator":
        return MelGANMultiScaleDiscriminator.from_config(params)
    if dtype == "HiFiGANMultiScaleMultiPeriodDiscriminator":
        return HiFiGANMultiScaleMultiPeriodDiscriminator.from_config(params)
    raise KeyError(f"unknown discriminator_type {dtype!r}")


def build_signal_generator(cfg: dict):
    from .ops.signal_gen import SignalGenerator

    sg = cfg.get("signal_generator", {})
    return SignalGenerator(
        sample_rate=cfg.get("sampling_rate", 16000),
        hop_size=cfg.get("hop_size", 160),
        sine_amp=sg.get("sine_amp", 0.1),
        noise_amp=sg.get("noise_amp", 0.003),
        signal_types=tuple(sg.get("signal_types", ["sine"])),
        sine_f0_type=sg.get("sine_f0_type", "f0"),  # conf/fastsvc.yaml:79
        # None = auto (fused Mosaic kernel on TPU, XLA path elsewhere)
        use_pallas=sg.get("use_pallas", None),
    )


def parse_compute_dtype(dtype_name):
    """'bfloat16'/'bf16' -> jnp.bfloat16; None/'float32'/'f32' -> None."""
    import jax.numpy as jnp

    if dtype_name in (None, "float32", "f32"):
        return None
    if dtype_name in ("bfloat16", "bf16"):
        return jnp.bfloat16
    raise KeyError(f"unknown compute_dtype {dtype_name!r}")


def build_train_task(cfg: dict):
    from .losses import MultiResolutionSTFTLoss
    from .train import FastSVCTrainTask, make_optimizer

    # mixed precision: conv/matmul compute dtype (params, optimizer state
    # and losses stay f32; see FastSVCTrainTask._cast)
    compute_dtype = parse_compute_dtype(cfg.get("compute_dtype"))

    stft = cfg.get("stft_loss_params", DEFAULTS["stft_loss_params"])
    g_opt = cfg.get("generator_optimizer_params", {})
    g_sch = cfg.get("generator_scheduler_params", {})
    d_opt = cfg.get("discriminator_optimizer_params", {})
    d_sch = cfg.get("discriminator_scheduler_params", {})
    return FastSVCTrainTask(
        generator=build_generator(cfg),
        discriminator=build_discriminator(cfg),
        g_tx=make_optimizer(
            lr=g_opt.get("lr", 1e-3),
            eps=g_opt.get("eps", 1e-6),
            weight_decay=g_opt.get("weight_decay", 0.0),
            grad_norm=cfg.get("generator_grad_norm", 10),
            scheduler_step_size=g_sch.get("step_size", 100000),
            scheduler_gamma=g_sch.get("gamma", 0.5),
        ),
        d_tx=make_optimizer(
            lr=d_opt.get("lr", 1e-3),
            eps=d_opt.get("eps", 1e-6),
            weight_decay=d_opt.get("weight_decay", 0.0),
            grad_norm=cfg.get("discriminator_grad_norm", 1),
            scheduler_step_size=d_sch.get("step_size", 100000),
            scheduler_gamma=d_sch.get("gamma", 0.5),
        ),
        signal_generator=build_signal_generator(cfg),
        stft_loss=MultiResolutionSTFTLoss(
            tuple(stft["fft_sizes"]), tuple(stft["hop_sizes"]),
            tuple(stft["win_lengths"]),
        ),
        lambda_adv=cfg.get("lambda_adv", 2.5),
        lambda_aux=cfg.get("lambda_aux", 1.0),
        use_stft_loss=cfg.get("use_stft_loss", True),
        compute_dtype=compute_dtype,
    )
