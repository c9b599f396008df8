"""B02 stage-1 preprocessing: wav.scp → HDF5 bundles with WORLD features.

Reference: /root/reference/harana/bin/preprocess_b02.py — per utterance:
Harvest F0, cheaptrick→mcep(60), d4c→bap(3), continuous log-F0 + V/UV,
frame-rate A-weighted loudness, HuBERT-soft units @10 ms interpolated ×1.5,
per-utterance x-vector. TPU-native equivalents: YIN F0, the dsp.world
analysis stack, and pluggable linguistic features (hubert | logmel).
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

import jax.numpy as jnp

from ..config import load_config
from ..data.hdf5 import read_hdf5, write_hdf5
from ..data.dataset import validate_length
from ..dsp.f0 import yin_f0
from ..dsp.world import world_analyze
from ..ops.resample import nearest_resize
from ..ops.stft import stft_magnitude
from .common import iter_wav_scp, resample, setup_logging, utt_speaker
from .preprocess_fastsvc import logmel_extract


def loudness_extract_frames(audio, sr, hop):
    """Frame-rate A-weighted loudness (no sample-rate interpolation,
    reference preprocess_b02.py:108-120)."""
    from ..ops.stft import (
        a_weighting_db,
        db_to_amplitude,
        fft_frequencies,
        power_to_db,
    )

    power = stft_magnitude(
        jnp.asarray(audio, jnp.float32), 2048, hop, 2048,
        center=True, pad_mode="reflect", power=True, clamp_min=0.0,
    ).T
    weights = jnp.asarray(a_weighting_db(fft_frequencies(sr, 2048)), power.dtype)
    loud = db_to_amplitude(power_to_db(power) + weights[:, None])
    return np.asarray(jnp.log(jnp.mean(loud, axis=0) + 1e-5))


def extract_b02_features(utt_id, audio, sr, cfg, *, f0min, f0max,
                         linguistic="logmel", ppg_model=None):
    if cfg.get("trim_silence"):
        from ..dsp.trim import trim_silence

        audio, _ = trim_silence(
            np.asarray(audio),
            top_db=cfg.get("trim_threshold_in_db", 60),
            frame_length=cfg.get("trim_frame_size", 2048),
            hop_length=cfg.get("trim_hop_size", 512),
        )
    target_sr = cfg["sampling_rate"]
    hop = cfg["hop_size"]
    shiftms = cfg.get("shiftms", 160 / target_sr * 1000)
    audio16 = resample(audio, sr, 16000)
    audio_t = resample(audio, sr, target_sr)

    f0_hop = int(target_sr * shiftms / 1000)
    if cfg.get("f0_method", "harvest") == "harvest":
        from ..dsp.harvest import harvest_f0

        f0 = harvest_f0(
            audio_t, fs=target_sr, f0_floor=f0min, f0_ceil=f0max,
            frame_period_ms=shiftms,
        ).astype(np.float32)
    else:
        f0 = np.asarray(
            yin_f0(
                jnp.asarray(audio_t, jnp.float32), sr=target_sr, hop=f0_hop,
                f0_floor=f0min, f0_ceil=f0max,
            )
        )

    mcep, bap, lf0, vuv = world_analyze(
        audio_t, f0, fs=target_sr, hop=f0_hop,
        mcep_order=cfg.get("mcep_dim", 59),
    )

    lft = loudness_extract_frames(audio_t, target_sr, hop)

    if linguistic == "hubert":
        if ppg_model is None:
            raise ValueError("--hubert-checkpoint required")
        ppg = np.asarray(ppg_model(jnp.asarray(audio16, jnp.float32)))
    else:
        ppg = np.asarray(logmel_extract(audio16))
    if target_sr == 24000:
        ppg = np.asarray(
            nearest_resize(jnp.asarray(ppg)[None], int(len(ppg) * 1.5), axis=1)[0]
        )

    f0c, lf0c, vuvc, ppg_al, mcep_al, bap_al, lft_al = validate_length(
        [f0, lf0, vuv, ppg, mcep, bap, lft]
    )
    n = len(f0c)
    audio_al = audio_t[: n * hop]
    return {
        "wave": np.asarray(audio_al, np.float32),
        "f0": f0c.astype(np.float32).reshape(-1, 1),
        "lf0": lf0c.astype(np.float32).reshape(-1, 1),
        "vuv": vuvc.astype(np.float32).reshape(-1, 1),
        "ppg": ppg_al.astype(np.float32),
        "mcep": mcep_al.astype(np.float32),
        "bap": bap_al.astype(np.float32),
        "lft": lft_al.astype(np.float32).reshape(-1, 1),
    }


def main(argv=None):
    parser = argparse.ArgumentParser(description="B02 feature extraction")
    parser.add_argument("--wav-scp", "--scp", required=True)
    parser.add_argument("--dumpdir", required=True)
    parser.add_argument("--config", required=True)
    parser.add_argument("--f0-config", default=None)
    parser.add_argument("--spk-emb-file", default=None)
    parser.add_argument("--linguistic", default="logmel",
                        choices=["logmel", "hubert"])
    parser.add_argument("--hubert-checkpoint", default=None)
    parser.add_argument("--n-shards", type=int, default=1,
                        help="split the scp across N processes")
    parser.add_argument("--shard-id", type=int, default=0)
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args(argv)
    setup_logging(args.verbose)

    cfg = load_config(args.config)
    f0_ranges = {}
    if args.f0_config:
        import yaml

        with open(args.f0_config) as f:
            f0_ranges = yaml.safe_load(f) or {}

    ppg_model = None
    if args.linguistic == "hubert":
        from ..models.hubert import load_hubert_soft

        ppg_model = load_hubert_soft(args.hubert_checkpoint)

    os.makedirs(args.dumpdir, exist_ok=True)
    n = 0
    for idx, (utt_id, audio, sr) in enumerate(iter_wav_scp(args.wav_scp)):
        # scp sharding replaces the reference's split_scp.pl job arrays
        if idx % args.n_shards != args.shard_id:
            continue
        spk = utt_speaker(utt_id)
        rng = f0_ranges.get(spk, {})
        feats = extract_b02_features(
            utt_id, audio, sr, cfg,
            f0min=rng.get("minf0", 100.0), f0max=rng.get("maxf0", 1000.0),
            linguistic=args.linguistic, ppg_model=ppg_model,
        )
        if args.spk_emb_file:
            feats["spk_emb"] = np.asarray(
                read_hdf5(args.spk_emb_file, spk), np.float32
            ).reshape(1, -1)
        out = os.path.join(args.dumpdir, f"{utt_id}.h5")
        for name, arr in feats.items():
            write_hdf5(out, name, arr)
        n += 1
    logging.info("processed %d utterances -> %s", n, args.dumpdir)


if __name__ == "__main__":
    main()
