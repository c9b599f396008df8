"""Transfer wire format (data/wire.py): exactness contract + step parity.

The packed wire (int16 audio, bf16 ppg, frame-rate lft) exists for
transfer-bandwidth-bound links (docs/PERF_r05.md §6). These tests pin the
exactness claims: PCM16-grid audio round-trips bit-exact, hop-constant
loudness round-trips bit-exact, and a bf16-compute gan_step produces the
same metrics from a packed batch as from the raw f32 batch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svcc23_fastsvc_tpu.data.wire import WirePacker, unpack_batch

HOP = 20


def _batch(rng, B=2, F=10, hop=HOP, pcm=True, hop_constant=True):
    T = F * hop
    wave = 0.3 * np.sin(
        2 * np.pi * 220.0 * np.arange(T) / 4000.0
    ) + 0.01 * rng.standard_normal(T)
    wave = np.broadcast_to(wave.astype(np.float32)[None, :, None], (B, T, 1))
    if pcm:
        wave = np.clip(np.round(wave * 32768.0), -32768, 32767) / 32768.0
        wave = wave.astype(np.float32)
    if hop_constant:
        lft = np.repeat(
            rng.standard_normal((B, F, 1)).astype(np.float32), hop, axis=1
        )
    else:
        lft = rng.standard_normal((B, T, 1)).astype(np.float32)
    return {
        "audio": np.ascontiguousarray(wave),
        "lft": lft,
        "ppg": rng.standard_normal((B, F, 8)).astype(np.float32),
        "f0": np.full((B, F, 1), 220.0, np.float32),
        "spk_emb": rng.standard_normal((B, 12)).astype(np.float32),
    }


def test_pcm_audio_roundtrip_exact():
    b = _batch(np.random.default_rng(0))
    packed = WirePacker(hop_size=HOP)(b)
    assert packed["audio"].dtype == np.int16
    out = unpack_batch(
        jax.tree.map(jnp.asarray, packed), hop_size=HOP
    )
    np.testing.assert_array_equal(np.asarray(out["audio"]), b["audio"])


def test_frame_lft_roundtrip_exact():
    b = _batch(np.random.default_rng(1))
    packed = WirePacker(hop_size=HOP)(b)
    assert packed["lft"].shape[-2] == b["lft"].shape[-2] // HOP
    assert packed["lft"].dtype == np.float32  # frame path keeps f32
    out = unpack_batch(jax.tree.map(jnp.asarray, packed), hop_size=HOP)
    np.testing.assert_array_equal(np.asarray(out["lft"]), b["lft"])


def test_non_hop_constant_lft_falls_back_to_bf16():
    b = _batch(np.random.default_rng(2), hop_constant=False)
    packed = WirePacker(hop_size=HOP)(b)
    # full-rate, bf16: shape preserved, values quantized
    assert packed["lft"].shape == b["lft"].shape
    assert packed["lft"].dtype != np.float32
    out = unpack_batch(jax.tree.map(jnp.asarray, packed), hop_size=HOP)
    np.testing.assert_allclose(
        np.asarray(out["lft"], np.float32), b["lft"], rtol=1e-2, atol=1e-2
    )


def test_stacked_batch_axes():
    """Packer handles (K, B, T, C) multi-step stacks (time axis -2)."""
    rng = np.random.default_rng(3)
    bs = [_batch(rng) for _ in range(3)]
    stacked = jax.tree.map(lambda *xs: np.stack(xs), *bs)
    packed = WirePacker(hop_size=HOP)(stacked)
    assert packed["audio"].dtype == np.int16
    assert packed["lft"].shape == (3, 2, 10, 1)
    out = unpack_batch(jax.tree.map(jnp.asarray, packed), hop_size=HOP)
    np.testing.assert_array_equal(np.asarray(out["audio"]), stacked["audio"])
    np.testing.assert_array_equal(np.asarray(out["lft"]), stacked["lft"])


def test_unpack_idempotent_on_f32_batches():
    b = jax.tree.map(jnp.asarray, _batch(np.random.default_rng(4)))
    out = unpack_batch(b, hop_size=HOP)
    for k in b:
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(b[k]))


def test_packed_wire_through_train_cli(tmp_path):
    """Full train CLI with wire_format: packed runs end to end (loop-level
    packer integration: stacked multi-step batches, native/threaded
    batcher, logging) and the guard rejects packed + f32 compute."""
    import os
    import subprocess
    import sys

    import yaml

    from svcc23_fastsvc_tpu.data.hdf5 import write_hdf5

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sr, hop = 16000, 160
    dump = tmp_path / "dump"
    dump.mkdir()
    rng = np.random.default_rng(0)
    frames = 120
    for j in range(3):
        n = frames * hop
        wave = 0.3 * rng.standard_normal(n)
        wave = np.clip(np.round(wave * 32768), -32768, 32767) / 32768
        write_hdf5(str(dump / f"utt{j}.h5"), "wave", wave.astype(np.float32))
        write_hdf5(str(dump / f"utt{j}.h5"), "f0",
                   np.full(frames, 150.0, np.float32))
        write_hdf5(str(dump / f"utt{j}.h5"), "ppg",
                   rng.standard_normal((frames, 8)).astype(np.float32))
        write_hdf5(str(dump / f"utt{j}.h5"), "lft",
                   np.repeat(rng.standard_normal(frames), hop).astype(
                       np.float32))
        write_hdf5(str(dump / f"utt{j}.h5"), "spk_emb",
                   rng.standard_normal((1, 16)).astype(np.float32))
    cfg = {
        "sampling_rate": sr, "hop_size": hop,
        "generator_params": {
            "in_channels": 8, "mid_channels": [4, 4],
            "upsampling_scales": [8, 20], "spk_emb_size": 16,
            "use_spk_emb": True,
        },
        "discriminator_params": {
            "scales": 1, "channels": 4,
            "max_downsample_channels": 8, "downsample_scales": [4],
        },
        "stft_loss_params": {
            "fft_sizes": [64], "hop_sizes": [16], "win_lengths": [64],
        },
        "batch_size": 2, "batch_length": 1600,
        "signal_generator": {"sine_amp": 0.1, "noise_amp": 0.0,
                             "signal_types": ["sine"]},
        "discriminator_train_start_steps": 0,
        "train_max_steps": 6, "save_interval_steps": 100000,
        "eval_interval_steps": 3, "log_interval_steps": 3,
        "eval_batches": 1, "num_save_intermediate_results": 1,
        "loader_threads": 2, "steps_per_call": 3,
        "compute_dtype": "bfloat16", "wire_format": "packed",
    }
    (tmp_path / "config.yml").write_text(yaml.safe_dump(cfg))
    launch = (
        "import sys\nimport jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from svcc23_fastsvc_tpu.bin.train_fastsvc import main\n"
        "main(sys.argv[1:])\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH", ""))
    r = subprocess.run(
        [sys.executable, "-c", launch,
         "--train-dumpdir", str(dump), "--dev-dumpdir", str(dump),
         "--outdir", str(tmp_path / "exp"),
         "--config", str(tmp_path / "config.yml"), "--n-devices", "1"],
        capture_output=True, text=True, env=env, cwd=repo, timeout=900,
    )
    out = r.stdout + r.stderr
    assert r.returncode == 0, out[-3000:]
    assert "transfer wire format: packed" in out
    assert "wire: audio f32->int16" in out
    assert "frame-rate f32 (hop-constant)" in out
    assert "finished training" in out
    # the eval-time intermediate dump must work on PACKED batches too
    # (it reads batch["audio"] raw and runs _forward outside the jitted
    # steps, so the loop unwires first — regression: the round-5 soak's
    # dumps silently failed under the packed wire before this)
    assert "intermediate dump failed" not in out
    import glob as _glob
    dumped = _glob.glob(str(tmp_path / "exp" / "predictions" / "*" / "*.wav"))
    assert dumped, "eval intermediate wav dumps missing under packed wire"

    # guard: packed wire without bf16 compute must be refused
    cfg_bad = dict(cfg)
    del cfg_bad["compute_dtype"]
    (tmp_path / "config_bad.yml").write_text(yaml.safe_dump(cfg_bad))
    r2 = subprocess.run(
        [sys.executable, "-c", launch,
         "--train-dumpdir", str(dump), "--outdir", str(tmp_path / "exp2"),
         "--config", str(tmp_path / "config_bad.yml"), "--n-devices", "1"],
        capture_output=True, text=True, env=env, cwd=repo, timeout=900,
    )
    assert r2.returncode != 0
    assert "requires compute_dtype bfloat16" in (r2.stdout + r2.stderr)


def test_packed_gan_step_matches_f32_wire():
    """bf16-compute gan_step: packed batch gives the same losses as the
    raw f32 batch (the whole point of the exactness contract)."""
    from svcc23_fastsvc_tpu.losses import MultiResolutionSTFTLoss
    from svcc23_fastsvc_tpu.models.fastsvc import (
        FastSVCGenerator,
        MelGANMultiScaleDiscriminator,
    )
    from svcc23_fastsvc_tpu.ops import SignalGenerator
    from svcc23_fastsvc_tpu.train import FastSVCTrainTask, make_optimizer

    task = FastSVCTrainTask(
        generator=FastSVCGenerator(
            in_channels=8, mid_channels=(16, 8), upsampling_scales=(4, 5),
            spk_emb_size=12, use_spk_emb=True,
        ),
        discriminator=MelGANMultiScaleDiscriminator(
            scales=2, channels=4, max_downsample_channels=32,
            downsample_scales=(4, 4),
        ),
        g_tx=make_optimizer(lr=1e-3, grad_norm=10.0),
        d_tx=make_optimizer(lr=1e-3, grad_norm=1.0),
        signal_generator=SignalGenerator(
            sample_rate=4000, hop_size=HOP, noise_amp=0.0
        ),
        stft_loss=MultiResolutionSTFTLoss((64, 128), (16, 32), (64, 128)),
        lambda_adv=2.5,
        compute_dtype=jnp.bfloat16,
    )
    b = _batch(np.random.default_rng(5))
    packed = WirePacker(hop_size=HOP)(b)

    def run(batch):
        state = task.init_state(jax.random.PRNGKey(0))
        _, m = jax.jit(task.gan_step)(
            state, jax.tree.map(jnp.asarray, batch)
        )
        return {k: float(v) for k, v in m.items()}

    m_raw, m_packed = run(b), run(packed)
    assert m_raw.keys() == m_packed.keys()
    for k in m_raw:
        assert m_raw[k] == pytest.approx(m_packed[k], rel=1e-5, abs=1e-6), k
