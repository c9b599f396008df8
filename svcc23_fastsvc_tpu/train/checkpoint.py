"""Checkpoint / resume via Orbax.

Reference contract (/root/reference/harana/bin/train_fastsvc.py:104-155):
step-indexed checkpoints holding model + optimizer + scheduler + counters;
`--resume` restores everything, `--pretrain` restores params only. Here the
whole GANTrainState pytree is saved with orbax (the scheduler lives inside
the optax state, so it round-trips for free), and the experiment config is
dumped alongside as config.yml — the serialized contract decode reads back.
"""

from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp
import yaml


def _mgr(ckpt_dir: str, max_to_keep: Optional[int] = None) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(ckpt_dir: str, state, step: int, *, config: dict | None = None,
                    max_to_keep: Optional[int] = None):
    """Save the train-state pytree at `step`; optionally dump config.yml."""
    with _mgr(ckpt_dir, max_to_keep) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()
    if config is not None:
        with open(os.path.join(ckpt_dir, "config.yml"), "w") as f:
            yaml.safe_dump(config, f)


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    with _mgr(ckpt_dir) as mgr:
        return mgr.latest_step()


def load_checkpoint(ckpt_dir: str, target, step: Optional[int] = None):
    """Restore a full train state (resume). `target` provides the pytree
    structure/shardings (an abstract or concrete state)."""
    with _mgr(ckpt_dir) as mgr:
        if step is None:
            step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
        return mgr.restore(step, args=ocp.args.StandardRestore(target)), step


def load_params_only(ckpt_dir: str, target_state, step: Optional[int] = None):
    """Pretrain-style restore: model params only, fresh optimizer/counters
    (reference load_checkpoint(load_only_params=True), :130-155)."""
    restored, step = load_checkpoint(ckpt_dir, target_state, step)
    return (
        target_state.replace(
            g_params=restored.g_params, d_params=restored.d_params
        ),
        step,
    )


def load_config(ckpt_dir: str) -> dict:
    with open(os.path.join(ckpt_dir, "config.yml")) as f:
        return yaml.safe_load(f)
