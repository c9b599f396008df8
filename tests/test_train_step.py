"""GAN train step: both phases jit, update params, and decrease loss."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from svcc23_fastsvc_tpu.losses import MultiResolutionSTFTLoss
from svcc23_fastsvc_tpu.models.fastsvc import (
    FastSVCGenerator,
    MelGANMultiScaleDiscriminator,
)
from svcc23_fastsvc_tpu.ops.signal_gen import SignalGenerator
from svcc23_fastsvc_tpu.train import FastSVCTrainTask, make_optimizer


def tiny_task():
    gen = FastSVCGenerator(
        in_channels=8, mid_channels=(16, 8), upsampling_scales=(4, 5),
        spk_emb_size=12, use_spk_emb=True,
    )
    dis = MelGANMultiScaleDiscriminator(
        scales=2, channels=4, max_downsample_channels=32,
        downsample_scales=(4, 4),
    )
    return FastSVCTrainTask(
        generator=gen,
        discriminator=dis,
        g_tx=make_optimizer(lr=1e-3, grad_norm=10.0),
        d_tx=make_optimizer(lr=1e-3, grad_norm=1.0),
        signal_generator=SignalGenerator(sample_rate=4000, hop_size=20, noise_amp=0.0),
        stft_loss=MultiResolutionSTFTLoss((64, 128), (16, 32), (64, 128)),
        lambda_adv=2.5,
    )


def tiny_batch(key, B=2, Tf=10, hop=20):
    ks = jax.random.split(key, 4)
    t = jnp.arange(Tf * hop) / 4000.0
    audio = 0.1 * jnp.sin(2 * jnp.pi * 220.0 * t)
    return {
        "ppg": jax.random.normal(ks[0], (B, Tf, 8)),
        "f0": jnp.full((B, Tf, 1), 220.0),
        "lft": jax.random.normal(ks[1], (B, Tf * hop, 1)) * 0.1,
        "spk_emb": jax.random.normal(ks[2], (B, 12)),
        "audio": jnp.broadcast_to(audio[None, :, None], (B, Tf * hop, 1)),
    }


def test_gen_phase_trains():
    task = tiny_task()
    state = task.init_state(jax.random.PRNGKey(0))
    gen_step, _ = task.jit_steps(donate=False)
    batch = tiny_batch(jax.random.PRNGKey(1))

    losses = []
    for _ in range(30):
        state, metrics = gen_step(state, batch)
        losses.append(float(metrics["generator_loss"]))
    assert state.step == 30
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"no improvement: {losses[0]} -> {losses[-1]}"


def test_gan_phase_updates_both():
    task = tiny_task()
    state = task.init_state(jax.random.PRNGKey(0))
    _, gan_step = task.jit_steps(donate=False)
    batch = tiny_batch(jax.random.PRNGKey(1))

    d_before = jax.tree.map(lambda x: x.copy(), state.d_params)
    g_before = jax.tree.map(lambda x: x.copy(), state.g_params)
    for _ in range(3):
        state, metrics = gan_step(state, batch)
    for k in ("generator_loss", "adversarial_loss", "real_loss", "fake_loss"):
        assert np.isfinite(float(metrics[k])), k

    changed_d = jax.tree.reduce(
        lambda a, b: a or b,
        jax.tree.map(lambda a, b: bool(jnp.any(a != b)), d_before, state.d_params),
    )
    changed_g = jax.tree.reduce(
        lambda a, b: a or b,
        jax.tree.map(lambda a, b: bool(jnp.any(a != b)), g_before, state.g_params),
    )
    assert changed_d and changed_g


def test_eval_step_no_state_change():
    task = tiny_task()
    state = task.init_state(jax.random.PRNGKey(0))
    batch = tiny_batch(jax.random.PRNGKey(1))
    metrics = jax.jit(lambda s, b: task.eval_step(s, b))(state, batch)
    assert np.isfinite(float(metrics["generator_loss"]))
    assert np.isfinite(float(metrics["discriminator_loss"]))


def test_trainer_steps_per_call(tmp_path):
    """Multi-step-per-dispatch path reaches max_steps exactly and saves."""
    from svcc23_fastsvc_tpu.train.loop import Trainer

    task = tiny_task()
    state = task.init_state(jax.random.PRNGKey(0))

    class Batches:
        def __iter__(self):
            i = 0
            while True:
                yield {k: np.asarray(v) for k, v in
                       tiny_batch(jax.random.PRNGKey(i)).items()}
                i += 1

    cfg = {
        "train_max_steps": 10,
        "discriminator_train_start_steps": 4,
        "log_interval_steps": 5,
        "eval_interval_steps": 100,
        "save_interval_steps": 100,
        "batch_size": 2,
        "batch_length": 200,
        "sampling_rate": 4000,
        "steps_per_call": 4,
    }
    trainer = Trainer(task, state, Batches(), config=cfg,
                      outdir=str(tmp_path / "exp"))
    final = trainer.run()
    assert int(jax.device_get(final.step)) == 10
    from svcc23_fastsvc_tpu.train.checkpoint import latest_step

    assert latest_step(str(tmp_path / "exp")) == 10


def test_trainer_on_native_producer(tmp_path):
    """Trainer consumes the C++ producer loop directly (is_prefetching
    path) through the steps_per_call stacking, which holds K slot views at
    once (train/loop.py:214)."""
    from svcc23_fastsvc_tpu.data.native_batch import (
        NativeBatchProducer,
        native_batch_available,
    )
    from svcc23_fastsvc_tpu.train.loop import Trainer

    if not native_batch_available():
        pytest.skip("libbatch.so not buildable here")
    task = tiny_task()
    state = task.init_state(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    n, max_frames, hop, D, E = 3, 40, 20, 8, 12
    packed = {
        "audio": rng.standard_normal((n, max_frames * hop)).astype(np.float32) * 0.1,
        "f0": np.full((n, max_frames), 220.0, np.float32),
        "ppg": rng.standard_normal((n, max_frames, D)).astype(np.float32),
        "lft": rng.standard_normal((n, max_frames * hop)).astype(np.float32) * 0.1,
        "spk_emb": rng.standard_normal((n, E)).astype(np.float32),
        "n_frames": np.full((n,), max_frames, np.int64),
    }
    k = 4
    producer = NativeBatchProducer(
        packed, batch_size=2, frames=10, hop=hop, use_spk_emb=True,
        n_threads=2, hold=2 * k, seed=7,
    )
    cfg = {
        "train_max_steps": 8,
        "discriminator_train_start_steps": 4,
        "log_interval_steps": 100,
        "eval_interval_steps": 100,
        "save_interval_steps": 100,
        "batch_size": 2,
        "batch_length": 200,
        "sampling_rate": 4000,
        "steps_per_call": k,
    }
    try:
        trainer = Trainer(task, state, producer, config=cfg,
                          outdir=str(tmp_path / "exp"))
        final = trainer.run()
    finally:
        producer.close()
    assert int(jax.device_get(final.step)) == 8


def test_trainer_warmup_fast_forward(tmp_path):
    """generator_train_start_steps > 0: the idle warm-up region advances
    state.step together with the loop counter (round-1 desync bug), for both
    the single-step and the scanned multi-step paths."""
    from svcc23_fastsvc_tpu.train.checkpoint import latest_step
    from svcc23_fastsvc_tpu.train.loop import Trainer

    class Batches:
        def __iter__(self):
            i = 0
            while True:
                yield {k: np.asarray(v) for k, v in
                       tiny_batch(jax.random.PRNGKey(i)).items()}
                i += 1

    for steps_per_call in (1, 3):
        task = tiny_task()
        state = task.init_state(jax.random.PRNGKey(0))
        cfg = {
            "train_max_steps": 9,
            "discriminator_train_start_steps": 6,
            "generator_train_start_steps": 4,
            "log_interval_steps": 100,
            "eval_interval_steps": 100,
            "save_interval_steps": 100,
            "batch_size": 2,
            "batch_length": 200,
            "sampling_rate": 4000,
            "steps_per_call": steps_per_call,
        }
        outdir = str(tmp_path / f"exp{steps_per_call}")
        trainer = Trainer(task, state, Batches(), config=cfg, outdir=outdir)
        final = trainer.run()
        # loop counter and state.step agree at the end: 9, not 9 - 5 skipped
        assert int(jax.device_get(final.step)) == 9, steps_per_call
        assert latest_step(outdir) == 9


def test_gan_step_with_hifigan_discriminator():
    """Alternative discriminator family (README.md:31 change note) trains."""
    from svcc23_fastsvc_tpu.models.fastsvc import (
        HiFiGANMultiScaleMultiPeriodDiscriminator,
    )
    from svcc23_fastsvc_tpu.train import FastSVCTrainTask, make_optimizer
    from svcc23_fastsvc_tpu.losses import MultiResolutionSTFTLoss
    from svcc23_fastsvc_tpu.ops.signal_gen import SignalGenerator
    from svcc23_fastsvc_tpu.models.fastsvc import FastSVCGenerator

    gen = FastSVCGenerator(
        in_channels=8, mid_channels=(16, 8), upsampling_scales=(4, 5),
        spk_emb_size=12, use_spk_emb=True,
    )
    dis = HiFiGANMultiScaleMultiPeriodDiscriminator(
        scales=2, periods=(2, 3),
        scale_params={"channels": 16, "max_downsample_channels": 32,
                      "max_groups": 4, "downsample_scales": [2, 2]},
        period_params={"channels": 4, "max_downsample_channels": 16,
                       "downsample_scales": [3, 1]},
    )
    task = FastSVCTrainTask(
        generator=gen, discriminator=dis,
        g_tx=make_optimizer(lr=1e-3, grad_norm=10.0),
        d_tx=make_optimizer(lr=1e-3, grad_norm=1.0),
        signal_generator=SignalGenerator(sample_rate=4000, hop_size=20,
                                         noise_amp=0.0),
        stft_loss=MultiResolutionSTFTLoss((64,), (16,), (64,)),
    )
    state = task.init_state(jax.random.PRNGKey(0))
    _, gan_step = task.jit_steps(donate=False)
    state, m = gan_step(state, tiny_batch(jax.random.PRNGKey(1)))
    for k in ("adversarial_loss", "real_loss", "fake_loss"):
        assert np.isfinite(float(m[k])), k


def test_bf16_compute_parity_and_convergence():
    """compute_dtype=bf16 (VERDICT round-1 weak #5): losses stay f32, the
    initial loss is within bf16 tolerance of the f32 pipeline, and the
    generator still converges over a short run."""
    import dataclasses

    task32 = tiny_task()
    task16 = dataclasses.replace(task32, compute_dtype=jnp.bfloat16)
    batch = tiny_batch(jax.random.PRNGKey(1))

    s32 = task32.init_state(jax.random.PRNGKey(0))
    s16 = task16.init_state(jax.random.PRNGKey(0))
    m32 = jax.jit(lambda s, b: task32.eval_step(s, b))(s32, batch)
    m16 = jax.jit(lambda s, b: task16.eval_step(s, b))(s16, batch)
    for k in ("generator_loss", "discriminator_loss"):
        a, b = float(m32[k]), float(m16[k])
        assert m16[k].dtype == jnp.float32  # losses computed in f32
        assert abs(a - b) < 0.1 * max(abs(a), 1.0), (k, a, b)

    # params remain f32 through updates; loss decreases
    gen_step, gan_step = task16.jit_steps(donate=False)
    losses = []
    state = s16
    for _ in range(25):
        state, metrics = gen_step(state, batch)
        losses.append(float(metrics["generator_loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    assert all(p.dtype == jnp.float32
               for p in jax.tree.leaves(state.g_params))
    # GAN phase also runs under bf16 compute
    state, metrics = gan_step(state, batch)
    for k in ("adversarial_loss", "real_loss", "fake_loss"):
        assert np.isfinite(float(metrics[k])), k


def test_bf16_inference_spectral_parity():
    """bf16 synthesis (decode --infer-dtype bf16): casting folded params +
    inputs to bf16 yields output spectrally close to the f32 forward —
    the guarantee behind bfloat16 being the decode default."""
    from svcc23_fastsvc_tpu.ops import fold_weight_norm
    from svcc23_fastsvc_tpu.ops.stft import stft_magnitude

    model = FastSVCGenerator(
        in_channels=16, mid_channels=(32, 16), upsampling_scales=(4, 5),
        spk_emb_size=12, use_spk_emb=True,
    )
    params = fold_weight_norm(model.init(jax.random.PRNGKey(0)))
    B, Tf, hop = 2, 20, 20
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    sg = SignalGenerator(sample_rate=4000, hop_size=hop, noise_amp=0.0)
    args = (
        jax.random.normal(ks[0], (B, Tf, 16)),
        sg(jnp.full((B, Tf, 1), 220.0), ks[1]),
        jax.random.normal(ks[2], (B, Tf * hop, 1)) * 0.1,
        jax.random.normal(ks[3], (B, 12)),
    )
    y32 = model.apply(params, *args)

    cast = lambda t: jax.tree.map(  # noqa: E731
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t
    )
    y16 = model.apply(cast(params), *cast(args)).astype(jnp.float32)
    assert np.isfinite(np.asarray(y16)).all()

    m32 = stft_magnitude(y32[..., 0], 64, 16, 64)
    m16 = stft_magnitude(y16[..., 0], 64, 16, 64)
    sc = float(jnp.linalg.norm(m16 - m32) / jnp.linalg.norm(m32))
    assert sc < 0.15, sc


def test_intermediate_dump_writes_wavs_and_pngs(tmp_path):
    """Eval-time listening artifacts: wav pairs + waveform/spectrogram PNGs
    (reference train_fastsvc.py:353-403)."""
    import os

    from svcc23_fastsvc_tpu.train.loop import Trainer

    task = tiny_task()
    state = task.init_state(jax.random.PRNGKey(0))

    class Batches:
        def __iter__(self):
            i = 0
            while True:
                yield {k: np.asarray(v) for k, v in
                       tiny_batch(jax.random.PRNGKey(i)).items()}
                i += 1

    cfg = {
        "train_max_steps": 2,
        "discriminator_train_start_steps": 10,
        "log_interval_steps": 100,
        "eval_interval_steps": 2,
        "save_interval_steps": 100,
        "eval_batches": 1,
        "num_save_intermediate_results": 1,
        "batch_size": 2,
        "batch_length": 200,
        "sampling_rate": 4000,
    }
    trainer = Trainer(task, state, Batches(), config=cfg,
                      outdir=str(tmp_path / "exp"), dev_batcher=Batches())
    trainer.run()
    pred = tmp_path / "exp" / "predictions" / "step2"
    files = sorted(os.listdir(pred))
    assert "0_gen.wav" in files and "0_ref.wav" in files
    assert "0.png" in files
    assert (pred / "0.png").stat().st_size > 1000


def test_config_compute_dtype_wiring():
    from svcc23_fastsvc_tpu.config import build_train_task

    base = {
        "generator_params": {"in_channels": 8, "mid_channels": [8, 8],
                             "upsampling_scales": [4, 5],
                             "spk_emb_size": 12, "use_spk_emb": True},
        "discriminator_params": {"scales": 2, "channels": 4,
                                 "max_downsample_channels": 16,
                                 "downsample_scales": [4, 4]},
        "sampling_rate": 4000, "hop_size": 20,
    }
    assert build_train_task(base).compute_dtype is None
    assert build_train_task({**base, "compute_dtype": "bfloat16"}
                            ).compute_dtype == jnp.bfloat16
    assert build_train_task({**base, "compute_dtype": "float32"}
                            ).compute_dtype is None
    with pytest.raises(KeyError):
        build_train_task({**base, "compute_dtype": "fp8"})
