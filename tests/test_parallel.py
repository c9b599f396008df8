"""Mesh data parallelism on the 8-device virtual CPU backend."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from svcc23_fastsvc_tpu.parallel import (
    global_batch,
    jit_train_step_dp,
    make_mesh,
    replicate,
    shard_batch,
)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_step_matches_single_device():
    """A DP step over 8 devices must equal the same step on one device
    (same global batch, replicated state)."""
    from test_train_step import tiny_batch, tiny_task

    task = tiny_task()
    state0 = task.init_state(jax.random.PRNGKey(0))
    batch = tiny_batch(jax.random.PRNGKey(1), B=8)

    # single-device
    s_single, m_single = jax.jit(task.gen_step)(state0, batch)

    # 8-device DP
    mesh = make_mesh(8)
    state_r = replicate(task.init_state(jax.random.PRNGKey(0)), mesh)
    batch_s = shard_batch(batch, mesh)
    step = jit_train_step_dp(task.gen_step, mesh, donate=False)
    s_dp, m_dp = step(state_r, batch_s)

    np.testing.assert_allclose(
        float(m_dp["generator_loss"]), float(m_single["generator_loss"]),
        rtol=1e-5,
    )
    g1 = jax.tree.leaves(s_single.g_params)
    g2 = jax.tree.leaves(s_dp.g_params)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_global_batch_single_process():
    mesh = make_mesh(8)
    local = {"x": np.arange(32, dtype=np.float32).reshape(8, 4)}
    g = global_batch(local, mesh)
    assert g["x"].shape == (8, 4)
    np.testing.assert_array_equal(np.asarray(g["x"]), local["x"])


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_gan_step_matches_single_device():
    """Full GAN phase (G+D updates) under DP == single device."""
    from test_train_step import tiny_batch, tiny_task

    task = tiny_task()
    batch = tiny_batch(jax.random.PRNGKey(1), B=8)

    s_single, m_single = jax.jit(task.gan_step)(
        task.init_state(jax.random.PRNGKey(0)), batch
    )

    mesh = make_mesh(8)
    state_r = replicate(task.init_state(jax.random.PRNGKey(0)), mesh)
    step = jit_train_step_dp(task.gan_step, mesh, donate=False)
    s_dp, m_dp = step(state_r, shard_batch(batch, mesh))

    for k in ("generator_loss", "discriminator_loss"):
        np.testing.assert_allclose(
            float(m_dp[k]), float(m_single[k]), rtol=1e-4, err_msg=k
        )
    for a, b in zip(jax.tree.leaves(s_single.d_params),
                    jax.tree.leaves(s_dp.d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_multi_step_matches_sequential_dp():
    """K-step scanned DP (steps_per_call x mesh composition) == K sequential
    DP steps on the same batches."""
    from svcc23_fastsvc_tpu.parallel import jit_multi_step_dp, shard_stacked_batch
    from test_train_step import tiny_batch, tiny_task

    task = tiny_task()
    K = 3
    batches = [tiny_batch(jax.random.PRNGKey(10 + i), B=8) for i in range(K)]

    mesh = make_mesh(8)
    # sequential DP steps
    state_seq = replicate(task.init_state(jax.random.PRNGKey(0)), mesh)
    step = jit_train_step_dp(task.gan_step, mesh, donate=False)
    seq_metrics = []
    for b in batches:
        state_seq, m = step(state_seq, shard_batch(b, mesh))
        seq_metrics.append(m)

    # one scanned K-step DP dispatch
    state_scan = replicate(task.init_state(jax.random.PRNGKey(0)), mesh)
    stacked = shard_stacked_batch(
        jax.tree.map(lambda *xs: jnp.stack(xs), *batches), mesh
    )
    multi = jit_multi_step_dp(task.gan_step, mesh, donate=False)
    state_scan, scan_metrics = multi(state_scan, stacked)

    assert int(jax.device_get(state_scan.step)) == K
    for i, m in enumerate(seq_metrics):
        for k in ("generator_loss", "discriminator_loss"):
            np.testing.assert_allclose(
                float(scan_metrics[k][i]), float(m[k]), rtol=1e-4,
                err_msg=f"step {i} {k}",
            )
    for a, b in zip(jax.tree.leaves(state_seq.g_params),
                    jax.tree.leaves(state_scan.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_trainer_mesh_with_steps_per_call(tmp_path):
    """Trainer keeps the scanned multi-step when a mesh is configured
    (the round-1 code silently forced steps_per_call=1 under DP)."""
    from svcc23_fastsvc_tpu.train.loop import Trainer
    from test_train_step import tiny_batch, tiny_task

    task = tiny_task()
    state = task.init_state(jax.random.PRNGKey(0))

    class Batches:
        def __iter__(self):
            i = 0
            while True:
                yield {k: np.asarray(v) for k, v in
                       tiny_batch(jax.random.PRNGKey(i), B=8).items()}
                i += 1

    cfg = {
        "train_max_steps": 8,
        "discriminator_train_start_steps": 4,
        "log_interval_steps": 4,
        "eval_interval_steps": 100,
        "save_interval_steps": 100,
        "batch_size": 8,
        "batch_length": 200,
        "sampling_rate": 4000,
        "steps_per_call": 4,
    }
    trainer = Trainer(task, state, Batches(), config=cfg,
                      outdir=str(tmp_path / "exp"), mesh=make_mesh(8))
    assert trainer.steps_per_call == 4  # not silently disabled
    final = trainer.run()
    assert int(jax.device_get(final.step)) == 8


def _assert_params_close(tree_a, tree_b, *, rtol=2e-3, atol=1e-3,
                         agg_tol=2e-6):
    """Element-wise within (rtol, atol) AND mean |diff| <= agg_tol."""
    total, count = 0.0, 0
    for a, b in zip(jax.tree.leaves(tree_a), jax.tree.leaves(tree_b)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        np.testing.assert_allclose(a, b, rtol=rtol, atol=atol)
        total += np.abs(a - b).sum()
        count += a.size
    assert total / count <= agg_tol, f"mean |diff| {total / count:.3e}"


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_shard_map_dp_matches_gspmd_dp():
    """shard_map DP (explicit per-shard step + pmean) == GSPMD DP for the
    deterministic task (noise_amp=0): same params, same metrics."""
    from svcc23_fastsvc_tpu.parallel import shard_map_step_dp
    from test_train_step import tiny_batch, tiny_task

    task = tiny_task()
    batch = tiny_batch(jax.random.PRNGKey(1), B=8)
    mesh = make_mesh(8)

    state_g = replicate(task.init_state(jax.random.PRNGKey(0)), mesh)
    gspmd = jit_train_step_dp(task.gan_step, mesh, donate=False)
    s_g, m_g = gspmd(state_g, shard_batch(batch, mesh))

    state_s = replicate(task.init_state(jax.random.PRNGKey(0)), mesh)
    smap = shard_map_step_dp(task, "gan", mesh, donate=False)
    s_s, m_s = smap(state_s, shard_batch(batch, mesh))

    for k in m_g:
        np.testing.assert_allclose(float(m_s[k]), float(m_g[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)
    # Per-element: loose (near-cancelling grad sums — weight-norm g scalars
    # — amplify f32 reduction-order noise). Aggregate: tight, so any
    # systematic difference (e.g. a mis-scaled pmean) still fails loudly.
    _assert_params_close(s_g.g_params, s_s.g_params)
    _assert_params_close(s_g.d_params, s_s.d_params)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_shard_map_dp_runs_pallas_conv():
    """The point of the shard_map path: the fused Pallas convs (which GSPMD
    cannot partition) run under DP. Interpret-mode kernel on the CPU mesh,
    T large enough for the kernel gate; must match the XLA-mode GSPMD DP."""
    from svcc23_fastsvc_tpu.ops.conv import set_pallas_conv_mode
    from svcc23_fastsvc_tpu.parallel import shard_map_step_dp
    from test_train_step import tiny_batch, tiny_task

    task = tiny_task()
    batch = tiny_batch(jax.random.PRNGKey(1), B=8, Tf=20)  # T=400 >= 256
    mesh = make_mesh(8)

    set_pallas_conv_mode("0")
    state_g = replicate(task.init_state(jax.random.PRNGKey(0)), mesh)
    gspmd = jit_train_step_dp(task.gan_step, mesh, donate=False)
    s_g, m_g = gspmd(state_g, shard_batch(batch, mesh))

    try:
        set_pallas_conv_mode("1")
        state_s = replicate(task.init_state(jax.random.PRNGKey(0)), mesh)
        smap = shard_map_step_dp(task, "gan", mesh, donate=False)
        s_s, m_s = smap(state_s, shard_batch(batch, mesh))
    finally:
        set_pallas_conv_mode("auto")

    np.testing.assert_allclose(
        float(m_s["generator_loss"]), float(m_g["generator_loss"]), rtol=1e-4
    )
    _assert_params_close(s_g.g_params, s_s.g_params)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_shard_map_multi_step_matches_sequential():
    """K-step scanned shard_map DP == K sequential shard_map DP steps."""
    from svcc23_fastsvc_tpu.parallel import shard_map_step_dp, shard_stacked_batch
    from test_train_step import tiny_batch, tiny_task

    task = tiny_task()
    K = 3
    batches = [tiny_batch(jax.random.PRNGKey(20 + i), B=8) for i in range(K)]
    mesh = make_mesh(8)

    state_seq = replicate(task.init_state(jax.random.PRNGKey(0)), mesh)
    step = shard_map_step_dp(task, "gan", mesh, donate=False)
    for b in batches:
        state_seq, _ = step(state_seq, shard_batch(b, mesh))

    state_scan = replicate(task.init_state(jax.random.PRNGKey(0)), mesh)
    stacked = shard_stacked_batch(
        jax.tree.map(lambda *xs: jnp.stack(xs), *batches), mesh
    )
    multi = shard_map_step_dp(task, "gan", mesh, donate=False,
                              multi_step=True)
    state_scan, scan_metrics = multi(state_scan, stacked)

    assert int(jax.device_get(state_scan.step)) == K
    assert scan_metrics["generator_loss"].shape[0] == K
    _assert_params_close(state_seq.g_params, state_scan.g_params)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_b02_dp_step_runs_on_mesh():
    """B02 acoustic-model training step jits and runs over the 8-dev mesh."""
    from test_b02_train import tiny_batch as b02_batch, tiny_task as b02_task

    task = b02_task()
    mesh = make_mesh(8)
    state = replicate(task.init_state(jax.random.PRNGKey(0)), mesh)
    batch = b02_batch(jax.random.PRNGKey(1), B=8)
    batch["lengths"] = jnp.full((8,), 20, jnp.int32)
    step = jit_train_step_dp(task.gen_step, mesh, donate=False)
    state, metrics = step(state, shard_batch(batch, mesh))
    assert np.isfinite(float(metrics["mse_loss"]))
    assert int(jax.device_get(state.step)) == 1
