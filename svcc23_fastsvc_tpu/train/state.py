"""Train state + optimizer construction.

Reference semantics (/root/reference/harana/bin/train_fastsvc.py:737-776,
conf/fastsvc.yaml:92-104): RAdam for both G and D (lr 1e-3, eps 1e-6), step
LR decay (×0.5 every 100k steps, applied per optimizer step), global-norm
gradient clipping (G: 10, D: 1). Expressed as an optax chain.

`scale_by_ref_radam` reproduces the reference's RAdam
(harana/optimizers/radam.py:27-99, the LiyuanLucasLiu implementation) BIT
for bit in f32 — including its eps placement, which differs from
optax.radam: the reference computes `m / (sqrt(v) + eps)` with the
`sqrt(1-b2^t)` bias correction folded into the step size, i.e. an effective
eps of `eps / sqrt(1-b2^t)` against v_hat (larger early in training),
whereas optax uses `m_hat / (sqrt(v_hat) + eps)`. Exactness here is what
makes step-for-step convergence parity against the torch trainer testable.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import flax.struct
import jax
import jax.numpy as jnp
import optax


def make_schedule(lr: float, step_size: int, gamma: float):
    """torch StepLR equivalent: lr * gamma^(step // step_size)."""
    return optax.exponential_decay(
        init_value=lr,
        transition_steps=step_size,
        decay_rate=gamma,
        staircase=True,
    )


class RefRAdamState(NamedTuple):
    count: jax.Array
    mu: Any
    nu: Any


def scale_by_ref_radam(
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8
) -> optax.GradientTransformation:
    """Rectified-Adam scaling matching harana/optimizers/radam.py exactly.

    Per step t (1-based):
        m = b1*m + (1-b1)*g ;  v = b2*v + (1-b2)*g^2
        rho_inf = 2/(1-b2) - 1 ;  rho_t = rho_inf - 2t*b2^t/(1-b2^t)
        if rho_t >= 5:
            step = sqrt((1-b2^t)*(rho_t-4)/(rho_inf-4)*(rho_t-2)/rho_t
                        *rho_inf/(rho_inf-2)) / (1-b1^t)
            update = step * m / (sqrt(v) + eps)
        else:   # bias-corrected momentum-SGD fallback (degenerated_to_sgd)
            update = m / (1-b1^t)
    (the caller chains scale_by_learning_rate for the -lr factor)
    """

    def init_fn(params):
        zeros = lambda p: jnp.zeros_like(p)  # noqa: E731
        return RefRAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree.map(zeros, params),
            nu=jax.tree.map(zeros, params),
        )

    # Scalar coefficients the reference computes in python f64
    # (radam.py:66-85). A literal f32 transcription loses ~3e-5 relative
    # per step to catastrophic cancellation in
    #   rho_t = rho_inf - 2t*b2^t/(1-b2^t)   (two ~2/(1-b2) magnitude terms)
    # so rho_t is reformulated cancellation-free: with s = -t*ln(b2),
    #   2t*b2^t/(1-b2^t) = C * g(s),  C = -2/ln(b2),  g(s) = s/expm1(s)
    #   rho_t = C*(1 - g(s)) - (C - rho_inf)
    # where 1-g(s) uses its Bernoulli series for small s. Matches the f64
    # scalars to f32 rounding (pinned in tests/test_optimizer_parity.py).
    import math

    log_b1 = math.log(b1)
    log_b2 = math.log(b2)
    rho_inf = 2.0 / (1.0 - b2) - 1.0
    c_coef = -2.0 / log_b2
    d_coef = c_coef - rho_inf  # exact f64 difference of the near-equal pair

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        t = count.astype(jnp.float32)
        mu = jax.tree.map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, updates
        )
        nu = jax.tree.map(
            lambda v, g: b2 * v + (1.0 - b2) * (g * g), state.nu, updates
        )
        b1t = jnp.exp(t * log_b1)
        s = -t * log_b2
        em1 = jnp.expm1(s)
        # 1 - s/expm1(s): series s/2 - s^2/12 + s^4/720 - s^6/30240 for
        # small s (direct form cancels), direct form otherwise
        h_series = s * (0.5 - s * (
            1.0 / 12.0 - s * s * (1.0 / 720.0 - s * s / 30240.0)
        ))
        h = jnp.where(s < 0.69, h_series, (em1 - s) / jnp.maximum(em1, 1e-30))
        rho_t = c_coef * h - d_coef
        one_minus_b2t = -jnp.expm1(-s)
        rect = jnp.sqrt(
            one_minus_b2t
            * (rho_t - 4.0) / (rho_inf - 4.0)
            * (rho_t - 2.0) / rho_t
            * rho_inf / (rho_inf - 2.0)
        ) / (1.0 - b1t)
        sgd_step = 1.0 / (1.0 - b1t)
        use_rect = rho_t >= 5.0
        new_updates = jax.tree.map(
            lambda m, v: jnp.where(
                use_rect, rect * m / (jnp.sqrt(v) + eps), sgd_step * m
            ),
            mu,
            nu,
        )
        return new_updates, RefRAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


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
    chain = []
    if grad_norm and grad_norm > 0:
        chain.append(optax.clip_by_global_norm(grad_norm))
    if optimizer == "radam":
        chain.append(scale_by_ref_radam(eps=eps))
        if weight_decay:
            # reference: p -= wd * lr * p before the update (radam.py:88-89)
            chain.append(optax.add_decayed_weights(weight_decay))
        chain.append(optax.scale_by_learning_rate(schedule))
        return optax.chain(*chain)
    if optimizer == "adam":
        opt = optax.adam(schedule, eps=eps)
    elif optimizer == "adamw":
        opt = optax.adamw(schedule, eps=eps, weight_decay=weight_decay)
    else:
        raise ValueError(f"unknown optimizer {optimizer!r}")
    chain.append(opt)
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
