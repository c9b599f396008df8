"""Checkpoint save/resume/pretrain round-trips."""

import numpy as np

import jax
import jax.numpy as jnp

from svcc23_fastsvc_tpu.train.checkpoint import (
    latest_step,
    load_checkpoint,
    load_config,
    load_params_only,
    save_checkpoint,
)


def tiny_state():
    from test_train_step import tiny_task

    task = tiny_task()
    return task, task.init_state(jax.random.PRNGKey(0))


def trees_equal(a, b):
    return all(
        jax.tree.leaves(
            jax.tree.map(lambda x, y: bool(jnp.all(x == y)), a, b)
        )
    )


def test_save_resume_roundtrip(tmp_path):
    task, state = tiny_state()
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, state, 123, config={"hop_size": 20, "tag": "t"})
    assert latest_step(ckpt) == 123

    restored, step = load_checkpoint(ckpt, jax.tree.map(jnp.zeros_like, state))
    assert step == 123
    assert trees_equal(restored.g_params, state.g_params)
    assert trees_equal(restored.d_params, state.d_params)
    assert trees_equal(restored.g_opt_state, state.g_opt_state)
    assert load_config(ckpt) == {"hop_size": 20, "tag": "t"}


def test_pretrain_params_only(tmp_path):
    task, state = tiny_state()
    # advance a step so optimizer state is nontrivial
    gen_step, _ = task.jit_steps(donate=False)
    from test_train_step import tiny_batch

    state2, _ = gen_step(state, tiny_batch(jax.random.PRNGKey(1)))
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, state2, 1)

    fresh = task.init_state(jax.random.PRNGKey(9))
    loaded, _ = load_params_only(ckpt, fresh)
    assert trees_equal(loaded.g_params, state2.g_params)
    # counters/opt state stay fresh
    assert int(loaded.step) == 0
    assert trees_equal(loaded.g_opt_state, fresh.g_opt_state)
