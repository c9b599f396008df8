"""B02 stage-7: HN-uSFGAN vocoder synthesis over decoded bundles.

Reference: /root/reference/harana/bin/synthesize_b02.py:100-179 — per
decoded h5: sine excitation from the converted F0, pitch-dependent dilation
factors, replication-padded aux features → vocoder → PCM16 wav + RTF.
"""

from __future__ import annotations

import argparse
import logging
import os
import time

import numpy as np
import yaml

import jax
import jax.numpy as jnp

from ..data.dataset import USFGANDataset
from ..models.hnusfgan import HNUSFGANGenerator
from ..ops import SignalGenerator, fold_weight_norm
from .common import setup_logging, write_wav


def build_vocoder(cfg: dict) -> HNUSFGANGenerator:
    gp = dict(cfg.get("generator_params", {}))
    kw = {}
    mapping = {
        "harmonic_network_params": "harmonic_params",
        "noise_network_params": "noise_params",
        "filter_network_params": "filter_params",
    }
    for src, dst in mapping.items():
        if src in gp:
            kw[dst] = gp[src]
    for k in ("residual_channels", "gate_channels", "skip_channels",
              "aux_channels", "aux_context_window", "out_channels"):
        if k in gp:
            kw[k] = gp[k]
    if "upsample_params" in gp:
        kw["upsample_scales"] = tuple(gp["upsample_params"]["upsample_scales"])
    # the pipeline's dilation factors are frame-constant (USFGANDataset
    # repeats frame-rate df by hop) — enable the framewise slice gather
    kw["pd_frame_hop"] = cfg.get("hop_size", 0)
    return HNUSFGANGenerator(**kw)


def synthesize_b02(dumpdir: str, outdir: str, *, config: dict, params,
                   pad_frames: int = 0, infer_dtype: str = "float32"):
    model = build_vocoder(config)
    sg_cfg = config.get("signal_generator", {})
    sig_gen = SignalGenerator(
        sample_rate=config["sampling_rate"],
        hop_size=config["hop_size"],
        sine_amp=sg_cfg.get("sine_amp", 0.1),
        noise_amp=sg_cfg.get("noise_amp", 0.003),
        signal_types=tuple(sg_cfg.get("signal_types", ["sine", "noise"])),
        sine_f0_type=sg_cfg.get("sine_f0_type", "f0"),
        use_pallas=sg_cfg.get("use_pallas", None),
    )
    acw = config.get("aux_context_window", model.aux_context_window)
    ds = USFGANDataset(
        dumpdir,
        sample_rate=config["sampling_rate"],
        hop_size=config["hop_size"],
        dense_factor=config.get("dense_factor", 4),
        return_utt_id=True,
    )
    # --infer-dtype bf16 mirrors decode_fastsvc: params/inputs cast to
    # bf16 (the mixed-precision class the chip bench uses), f32 output.
    dt = jnp.bfloat16 if infer_dtype == "bfloat16" else jnp.float32
    if dt == jnp.bfloat16:
        params = jax.tree.map(
            lambda v: v.astype(dt) if v.dtype == jnp.float32 else v, params
        )

    def _fwd(p, x, c, d):
        y, s_ = model.apply(p, x.astype(dt), c.astype(dt), d)
        return y.astype(jnp.float32), s_

    fwd = jax.jit(_fwd)

    os.makedirs(outdir, exist_ok=True)
    total_audio, total_wall = 0.0, 0.0
    for i in range(len(ds)):
        utt_id, _, aux, df, f0 = ds[i]
        # replication-pad aux by the context window (reference pad_fn)
        aux_p = np.concatenate(
            [np.repeat(aux[:1], acw, 0), aux, np.repeat(aux[-1:], acw, 0)], 0
        )
        t0 = time.time()
        sine = sig_gen(
            jnp.asarray(f0, jnp.float32).reshape(1, -1, 1), jax.random.PRNGKey(i)
        )
        y, _ = fwd(
            params,
            sine,
            jnp.asarray(aux_p, jnp.float32)[None],
            jnp.asarray(df, jnp.float32)[None],
        )
        y = np.asarray(y)[0, :, 0]
        wall = time.time() - t0
        total_wall += wall
        total_audio += len(y) / config["sampling_rate"]
        write_wav(os.path.join(outdir, f"{utt_id}_gen.wav"), y,
                  config["sampling_rate"])
    rtf = total_wall / max(total_audio, 1e-9)
    logging.info("synthesized %d utterances (RTF %.4f, %.0f audio-s/s)",
                 len(ds), rtf, total_audio / max(total_wall, 1e-9))
    return rtf


def main(argv=None):
    parser = argparse.ArgumentParser(description="Synthesize B02 (TPU)")
    parser.add_argument("--dumpdir", required=True)
    parser.add_argument("--outdir", required=True)
    parser.add_argument("--checkpoint-dir", required=True,
                        help="vocoder checkpoint dir w/ config.yml")
    parser.add_argument("--infer-dtype", default="float32",
                        choices=["float32", "bfloat16"],
                        help="vocoder compute dtype (bfloat16 = chip bench)")
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args(argv)
    setup_logging(args.verbose)

    with open(os.path.join(args.checkpoint_dir, "config.yml")) as f:
        cfg = yaml.safe_load(f)

    from ..train.checkpoint import load_checkpoint

    model = build_vocoder(cfg)
    target = model.init(jax.random.PRNGKey(0))
    params, step = load_checkpoint(args.checkpoint_dir, target)
    logging.info("loaded vocoder params from step %d", step)
    params = fold_weight_norm(params)
    synthesize_b02(args.dumpdir, args.outdir, config=cfg, params=params,
                   infer_dtype=args.infer_dtype)


if __name__ == "__main__":
    main()
