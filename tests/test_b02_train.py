"""B02 train task: both phases jit, losses finite and improving."""

import numpy as np

import jax
import jax.numpy as jnp

from svcc23_fastsvc_tpu.models.tacotron2 import (
    MultiSubFreqDiscriminator,
    Tacotron2,
)
from svcc23_fastsvc_tpu.train.b02 import B02TrainTask
from svcc23_fastsvc_tpu.train.state import make_optimizer


def tiny_task():
    gen = Tacotron2(
        input_dim=12, output_dim=60, hidden_dim=16, econv_chans=8,
        prenet_dim=8, spk_emb_dim=8, dec_dropout_rate=0.0,
        prenet_dropout_rate=0.5,
    )
    dis = MultiSubFreqDiscriminator(batch_max_frames=10)
    return B02TrainTask(
        generator=gen,
        discriminator=dis,
        g_tx=make_optimizer(lr=1e-3, grad_norm=1.0),
        d_tx=make_optimizer(lr=1e-3, grad_norm=0.1),
    )


def tiny_batch(key, B=2, T=20):
    ks = jax.random.split(key, 5)
    return {
        "ppg": jax.random.normal(ks[0], (B, T, 12)),
        "lft": jax.random.normal(ks[1], (B, T, 1)) * 0.1,
        "lf0": jax.random.normal(ks[2], (B, T, 1)) * 0.1 + 5.0,
        "spk_emb": jax.random.normal(ks[3], (B, 8)),
        "targets": jax.random.normal(ks[4], (B, T, 63)) * 0.5,
        "lengths": jnp.asarray([20, 14], jnp.int32),
    }


def test_b02_gen_phase_trains():
    task = tiny_task()
    state = task.init_state(jax.random.PRNGKey(0))
    gen_step, _ = task.jit_steps(donate=False)
    batch = tiny_batch(jax.random.PRNGKey(1))
    losses = []
    for _ in range(15):
        state, m = gen_step(state, batch)
        losses.append(float(m["mse_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_b02_gan_phase_updates_discriminator():
    task = tiny_task()
    state = task.init_state(jax.random.PRNGKey(0))
    _, gan_step = task.jit_steps(donate=False)
    batch = tiny_batch(jax.random.PRNGKey(2))
    d_before = jax.tree.map(lambda x: x.copy(), state.d_params)
    state, m = gan_step(state, batch)
    for k in ("mse_loss", "adversarial_loss", "real_loss", "fake_loss"):
        assert np.isfinite(float(m[k])), k
    changed = jax.tree.reduce(
        lambda a, b: a or b,
        jax.tree.map(lambda a, b: bool(jnp.any(a != b)), d_before, state.d_params),
    )
    assert changed


def test_b02_bf16_mixed_precision_trains():
    """compute_dtype=bfloat16: params/opt stay f32, scan carry + matmuls
    bf16, losses f32 — both phases produce finite, training updates."""
    import dataclasses

    # lr high enough that the improvement clears bf16 resolution on the
    # tiny model (at 1e-3 the 6-step delta is ~1e-5, under bf16 noise)
    task = dataclasses.replace(
        tiny_task(), compute_dtype=jnp.bfloat16,
        g_tx=make_optimizer(lr=2e-2, grad_norm=1.0),
    )
    state = task.init_state(jax.random.PRNGKey(0))
    gen_step, gan_step = task.jit_steps(donate=False)
    batch = tiny_batch(jax.random.PRNGKey(4))
    losses = []
    for _ in range(8):
        state, m = gen_step(state, batch)
        losses.append(float(m["mse_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    state, m = gan_step(state, batch)
    for k in ("mse_loss", "adversarial_loss", "discriminator_loss"):
        assert np.isfinite(float(m[k])), k
    # params remained f32
    assert all(
        leaf.dtype == jnp.float32
        for leaf in jax.tree.leaves(state.g_params)
    )


def test_b02_bf16_matches_f32_first_step_losses():
    """bf16 first-step losses agree with f32 to bf16 rounding class."""
    import dataclasses

    t32 = tiny_task()
    t16 = dataclasses.replace(t32, compute_dtype=jnp.bfloat16)
    s32 = t32.init_state(jax.random.PRNGKey(0))
    s16 = t16.init_state(jax.random.PRNGKey(0))
    batch = tiny_batch(jax.random.PRNGKey(5))
    _, m32 = jax.jit(t32.gen_step)(s32, batch)
    _, m16 = jax.jit(t16.gen_step)(s16, batch)
    a, b = float(m32["mse_loss"]), float(m16["mse_loss"])
    assert abs(a - b) / abs(a) < 0.05, (a, b)


def test_b02_eval_uses_running_bn():
    task = tiny_task()
    state = task.init_state(jax.random.PRNGKey(0))
    gen_step, _ = task.jit_steps(donate=False)
    batch = tiny_batch(jax.random.PRNGKey(3))
    state, _ = gen_step(state, batch)
    m = jax.jit(task.eval_step)(state, batch)
    assert np.isfinite(float(m["mse_loss"]))


def test_b02_running_bn_accumulates():
    """Regression: each step's momentum update must chain on the PREVIOUS
    step's running stats (running = 0.9*running + 0.1*batch), not restart
    from the init stats every step. With a fixed batch, n gen steps give
    running_mean ≈ (1 - 0.9^n) * batch_mean — far from one step's 0.1×."""
    task = tiny_task()
    state = task.init_state(jax.random.PRNGKey(0))
    gen_step, gan_step = task.jit_steps(donate=False)
    batch = tiny_batch(jax.random.PRNGKey(4))
    for _ in range(12):
        state, _ = gen_step(state, batch)
    mean1 = np.asarray(state.g_bn["encoder"][0]["mean"])
    # the generator barely moves in 12 tiny steps, so the conv0 batch mean
    # is ~constant: accumulated fraction must be ~1-0.9^12 = 0.72, not 0.1
    state2 = task.init_state(jax.random.PRNGKey(0))
    state2, _ = gen_step(state2, batch)
    one = np.asarray(state2.g_bn["encoder"][0]["mean"])
    scale = np.abs(mean1).max()
    assert scale > 0
    ratio = np.abs(mean1).sum() / max(np.abs(one).sum(), 1e-12)
    assert 4.0 < ratio < 10.0, ratio  # (1-0.9^12)/0.1 = 7.2

    # the GAN phase advances stats TWICE per step (reference regenerates
    # with the updated generator in train mode, train_b02.py:225-233)
    sa = task.init_state(jax.random.PRNGKey(0))
    sa, _ = gan_step(sa, batch)
    two = np.asarray(sa.g_bn["encoder"][0]["mean"])
    ratio2 = np.abs(two).sum() / max(np.abs(one).sum(), 1e-12)
    assert 1.5 < ratio2 < 2.5, ratio2  # (1-0.9^2)/0.1 = 1.9
