"""Stage-1 preprocessing: wav.scp → per-utterance HDF5 feature dumps.

Reference: /root/reference/harana/bin/preprocess_fastsvc.py — per utterance:
F0 (Harvest, 10 ms shift), A-weighted loudness at sample rate, PPG (144-d
frozen conformer @10 ms), speaker embedding lookup, all length-aligned and
written as wave/f0/lft/ppg/spk_emb datasets.

TPU-native: F0 (YIN), loudness (Pallas/XLA STFT), and the linguistic
extractor all run jitted and can batch utterances; the per-utterance HDF5
contract stays identical so downstream stages interoperate with reference
dumps. Linguistic features are pluggable (--linguistic):
  conformer : JAX conformer PPG forward from a converted checkpoint
  logmel    : 80-d log-mel (self-contained fallback when no PPG checkpoint
              exists; set generator_params.in_channels accordingly)
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
from ..ops.stft import loudness_extract, mel_filterbank, stft_magnitude
from ..ops.resample import nearest_resize
from .common import iter_wav_scp, resample, setup_logging, utt_speaker


def logmel_extract(audio16k, *, n_mels=80, n_fft=1024, hop=160):
    """Self-contained 10 ms-hop log-mel linguistic features (T', n_mels)."""
    power = stft_magnitude(
        jnp.asarray(audio16k, jnp.float32), n_fft, hop, 800, power=True,
        clamp_min=0.0,
    )
    mel = power @ mel_filterbank(16000, n_fft, n_mels)
    return jnp.log(jnp.maximum(mel, 1e-10))


def extract_features(
    utt_id: str,
    audio,
    sr: int,
    cfg: dict,
    *,
    f0min: float,
    f0max: float,
    linguistic: str = "logmel",
    ppg_model=None,
):
    """Compute the FastSVC feature bundle for one utterance."""
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
    audio16 = resample(audio, sr, 16000)
    audio_t = resample(audio, sr, target_sr)

    # F0 at the PPG frame rate (reference f0_extract: shiftms on 16 kHz audio)
    f0_method = cfg.get("f0_method", "harvest")
    if f0_method == "harvest":
        from ..dsp.harvest import harvest_f0

        f0 = harvest_f0(
            audio16, fs=16000, f0_floor=f0min, f0_ceil=f0max,
            frame_period_ms=cfg.get("shiftms", 10),
        ).astype(np.float32)
    else:
        f0 = np.asarray(
            yin_f0(
                jnp.asarray(audio16, jnp.float32),
                sr=16000,
                hop=int(16000 * cfg.get("shiftms", 10) / 1000),
                f0_floor=f0min,
                f0_ceil=f0max,
            )
        )

    # A-weighted loudness at sample rate (reference loudness_extract)
    lft = np.asarray(
        loudness_extract(
            jnp.asarray(audio_t, jnp.float32), target_sr, cfg.get("lft_hop_size", 64)
        )
    )

    # linguistic features at 10 ms on 16 kHz audio
    if linguistic == "conformer":
        if ppg_model is None:
            raise ValueError("--ppg-checkpoint required for conformer features")
        ppg = np.asarray(ppg_model(jnp.asarray(audio16, jnp.float32)))
    elif linguistic == "logmel":
        ppg = np.asarray(logmel_extract(audio16))
    else:
        raise ValueError(f"unknown linguistic extractor {linguistic!r}")

    # 24 kHz targets interpolate PPG x1.5 (reference :242-249)
    if target_sr == 24000:
        ppg = np.asarray(
            nearest_resize(
                jnp.asarray(ppg)[None], int(len(ppg) * 1.5), axis=1
            )[0]
        )

    # align lengths: frame-rate feats to common frames, sample-rate to hop*frames
    f0, ppg, audio_al, lft_al = validate_length(
        [f0, ppg], [audio_t, lft], hop
    )
    return {
        "wave": audio_al.astype(np.float32),
        "f0": np.asarray(f0, np.float32),
        "ppg": np.asarray(ppg, np.float32),
        "lft": lft_al.astype(np.float32),
    }


def main():
    parser = argparse.ArgumentParser(description="FastSVC feature extraction")
    parser.add_argument("--wav-scp", "--scp", required=True)
    parser.add_argument("--dumpdir", required=True)
    parser.add_argument("--config", required=True)
    parser.add_argument("--f0-config", default=None, help="per-speaker f0 yaml")
    parser.add_argument("--spk-emb-file", default=None,
                        help="spk_embs.h5 with per-speaker embeddings")
    parser.add_argument("--linguistic", default="logmel",
                        choices=["logmel", "conformer"])
    parser.add_argument("--ppg-checkpoint", default=None)
    parser.add_argument("--n-shards", type=int, default=1,
                        help="split the scp across N processes")
    parser.add_argument("--shard-id", type=int, default=0)
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args()
    setup_logging(args.verbose)

    cfg = load_config(args.config)
    f0_ranges = {}
    if args.f0_config:
        import yaml

        with open(args.f0_config) as f:
            f0_ranges = yaml.safe_load(f) or {}

    ppg_model = None
    if args.linguistic == "conformer":
        from ..models.conformer_ppg import load_ppg_model

        ppg_model = load_ppg_model(args.ppg_checkpoint)

    os.makedirs(args.dumpdir, exist_ok=True)
    n = 0
    for idx, (utt_id, audio, sr) in enumerate(iter_wav_scp(args.wav_scp)):
        # scp sharding replaces the reference's split_scp.pl job arrays
        if idx % args.n_shards != args.shard_id:
            continue
        spk = utt_speaker(utt_id)
        rng = f0_ranges.get(spk, {})
        feats = extract_features(
            utt_id, audio, sr, cfg,
            f0min=rng.get("minf0", 70.0), f0max=rng.get("maxf0", 340.0),
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
