"""Train state + optimizer construction.

Reference semantics (/root/reference/harana/bin/train_fastsvc.py:737-776,
conf/fastsvc.yaml:92-104): RAdam for both G and D (lr 1e-3, eps 1e-6), step
LR decay (×0.5 every 100k steps, applied per optimizer step), global-norm
gradient clipping (G: 10, D: 1). Expressed as an optax chain; optax.radam
implements the same rectified-Adam update as the reference's RAdam
(harana/optimizers/radam.py) including the SGD fallback below the
rectification threshold.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import optax


def make_schedule(lr: float, step_size: int, gamma: float):
    """torch StepLR equivalent: lr * gamma^(step // step_size)."""
    return optax.exponential_decay(
        init_value=lr,
        transition_steps=step_size,
        decay_rate=gamma,
        staircase=True,
    )


def make_optimizer(
    *,
    lr: float = 1e-3,
    eps: float = 1e-6,
    weight_decay: float = 0.0,
    grad_norm: float = 0.0,
    scheduler_step_size: int = 100000,
    scheduler_gamma: float = 0.5,
    optimizer: str = "radam",
) -> optax.GradientTransformation:
    schedule = make_schedule(lr, scheduler_step_size, scheduler_gamma)
    if optimizer == "radam":
        opt = optax.radam(schedule, eps=eps)
    elif optimizer == "adam":
        opt = optax.adam(schedule, eps=eps)
    elif optimizer == "adamw":
        opt = optax.adamw(schedule, eps=eps, weight_decay=weight_decay)
    else:
        raise ValueError(f"unknown optimizer {optimizer!r}")
    chain = []
    if grad_norm and grad_norm > 0:
        chain.append(optax.clip_by_global_norm(grad_norm))
    chain.append(opt)
    if weight_decay and optimizer == "radam":
        # torch-style decoupled L2 via additive decay before the update
        chain.insert(0, optax.add_decayed_weights(weight_decay))
    return optax.chain(*chain)


@flax.struct.dataclass
class GANTrainState:
    """Replicable pytree holding the full two-optimizer GAN train state."""

    step: jax.Array
    g_params: Any
    d_params: Any
    g_opt_state: Any
    d_opt_state: Any
    rng: jax.Array

    @classmethod
    def create(cls, *, g_params, d_params, g_tx, d_tx, rng):
        import jax.numpy as jnp

        return cls(
            step=jnp.zeros((), jnp.int32),
            g_params=g_params,
            d_params=d_params,
            g_opt_state=g_tx.init(g_params),
            d_opt_state=d_tx.init(d_params),
            rng=rng,
        )
