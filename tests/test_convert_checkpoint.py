"""Reference .pkl checkpoint -> framework checkpoint -> decode parity."""

import os

import numpy as np
import pytest
import torch
import yaml

import jax
import jax.numpy as jnp

from conftest import make_reference_importable

HAS_REF = make_reference_importable()
pytestmark = pytest.mark.skipif(not HAS_REF, reason="reference tree not present")


def test_reference_pkl_roundtrip(tmp_path):
    """A checkpoint in the exact reference trainer format converts and the
    restored generator matches the torch forward."""
    from harana.models.fastsvc import (
        FastSVCGenerator as RefGen,
        MelGANMultiScaleDiscriminator as RefMSD,
    )
    from svcc23_fastsvc_tpu.bin.convert_checkpoint import (
        convert_fastsvc_checkpoint,
    )
    from svcc23_fastsvc_tpu.config import build_train_task, load_config
    from svcc23_fastsvc_tpu.train.checkpoint import load_checkpoint

    torch.manual_seed(0)
    gen = RefGen(in_channels=8, mid_channels=[16, 8], upsampling_scales=[4, 5],
                 spk_emb_size=12, use_spk_emb=True)
    dis = RefMSD(scales=2, channels=4, max_downsample_channels=16,
                 downsample_scales=[4, 4])
    # the reference trainer's on-disk dict (train_fastsvc.py:104-128)
    sd = {
        "model": {
            "generator": gen.state_dict(),
            "discriminator": dis.state_dict(),
        },
        "steps": 12345,
        "epochs": 7,
    }
    pkl = tmp_path / "checkpoint-12345steps.pkl"
    torch.save(sd, str(pkl))

    cfg = {
        "sampling_rate": 4000,
        "hop_size": 20,
        "generator_params": {
            "in_channels": 8, "mid_channels": [16, 8],
            "upsampling_scales": [4, 5], "spk_emb_size": 12,
            "use_spk_emb": True,
        },
        "discriminator_params": {
            "scales": 2, "channels": 4, "max_downsample_channels": 16,
            "downsample_scales": [4, 4],
        },
        "stft_loss_params": {"fft_sizes": [64], "hop_sizes": [16],
                             "win_lengths": [64]},
    }
    cfg_path = tmp_path / "config.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    outdir = str(tmp_path / "converted")
    steps = convert_fastsvc_checkpoint(str(pkl), str(cfg_path), outdir)
    assert steps == 12345

    task = build_train_task(load_config(str(cfg_path)))
    target = task.init_state(jax.random.PRNGKey(0))
    state, step = load_checkpoint(outdir, target)
    assert step == 12345

    # forward parity through the restored params
    ppg = torch.randn(1, 8, 10)
    sine = torch.randn(1, 1, 200)
    lft = torch.randn(1, 1, 200)
    emb = torch.randn(1, 12)
    with torch.no_grad():
        want = gen(ppg, sine, lft, emb)
    got = task.generator.apply(
        state.g_params,
        jnp.asarray(np.moveaxis(ppg.numpy(), 1, -1)),
        jnp.asarray(np.moveaxis(sine.numpy(), 1, -1)),
        jnp.asarray(np.moveaxis(lft.numpy(), 1, -1)),
        jnp.asarray(emb.numpy()),
    )
    np.testing.assert_allclose(
        np.asarray(got), np.moveaxis(want.numpy(), 1, -1), rtol=1e-4, atol=1e-4
    )


def test_evaluate_dirs(tmp_path):
    from svcc23_fastsvc_tpu.bin.common import write_wav
    from svcc23_fastsvc_tpu.bin.evaluate import evaluate_dirs

    rng = np.random.default_rng(0)
    ref = tmp_path / "ref"; hyp = tmp_path / "hyp"
    ref.mkdir(); hyp.mkdir()
    x = (0.3 * np.sin(2 * np.pi * 220 * np.arange(8000) / 16000)).astype(np.float32)
    write_wav(str(ref / "utt1.wav"), x, 16000)
    write_wav(str(hyp / "utt1_to_spkB.wav"), x, 16000)  # identical -> ~0
    y = rng.standard_normal(8000).astype(np.float32) * 0.1
    write_wav(str(ref / "utt2.wav"), x, 16000)
    write_wav(str(hyp / "utt2_to_spkB.wav"), y, 16000)  # different -> > 0

    out = evaluate_dirs(str(ref), str(hyp))
    assert out["n_pairs"] == 2
    vals = out["per_utt"]
    assert vals["utt1_to_spkB"] < 0.05
    assert vals["utt2_to_spkB"] > 0.5
