"""Bisect the full GAN step's time by ablating pieces, with the carried-state
scan estimator bench.py uses (no DCE distortion: the whole train state is the
scan carry, so every update chain stays live).

Variants:
  full        complete gan_step (the headline)
  no_d_update D grads/update replaced by identity (G phase + regen only)
  no_regen    D trained on the pre-update generator's y_hat (1 G fwd saved)
  no_adv      G loss without adversarial term (still regen + D update)
  no_stft     adversarial-only G loss
  sgd         optax.sgd for both optimizers instead of RAdam+clip+decay
"""

import argparse
import dataclasses
import json
import sys

import jax
import optax

sys.path.insert(0, ".")
from bench import build_task, flops_of, make_batch, time_train  # noqa: E402

import jax.numpy as jnp  # noqa: E402


def variant_step(task, which):
    if which == "no_d_update":
        def step(state, batch):
            rng, k_sine, k2 = jax.random.split(state.rng, 3)
            grads, metrics = jax.grad(
                lambda p: task._gen_loss(p, state.d_params, batch, k_sine,
                                         with_adv=True), has_aux=True,
            )(state.g_params)
            updates, g_opt = task.g_tx.update(grads, state.g_opt_state,
                                              state.g_params)
            g_params = optax.apply_updates(state.g_params, updates)
            y_hat = jax.lax.stop_gradient(task._forward(g_params, batch, k2))
            # keep y_hat live without the D grad
            g_params = jax.tree.map(
                lambda p: p + 0.0 * jnp.mean(y_hat).astype(p.dtype), g_params
            )
            return state.replace(step=state.step + 1, g_params=g_params,
                                 g_opt_state=g_opt, rng=rng), metrics
        return step
    if which == "no_regen":
        def step(state, batch):
            rng, k_sine = jax.random.split(state.rng, 2)
            y_box = {}

            def loss(p):
                v, m = task._gen_loss(p, state.d_params, batch, k_sine,
                                      with_adv=True)
                return v, m

            grads, metrics = jax.grad(loss, has_aux=True)(state.g_params)
            updates, g_opt = task.g_tx.update(grads, state.g_opt_state,
                                              state.g_params)
            g_params = optax.apply_updates(state.g_params, updates)
            y_hat = jax.lax.stop_gradient(
                task._forward(state.g_params, batch, k_sine)
            )  # pre-update params, same key: XLA reuses the G-phase forward
            d_grads, _ = jax.grad(
                lambda p: task._dis_loss(p, batch["audio"], y_hat),
                has_aux=True)(state.d_params)
            d_updates, d_opt = task.d_tx.update(d_grads, state.d_opt_state,
                                                state.d_params)
            d_params = optax.apply_updates(state.d_params, d_updates)
            return state.replace(step=state.step + 1, g_params=g_params,
                                 g_opt_state=g_opt, d_params=d_params,
                                 d_opt_state=d_opt, rng=rng), metrics
        return step
    return task.gan_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--k1", type=int, default=10)
    ap.add_argument("--k2", type=int, default=40)
    ap.add_argument("--variants", nargs="*", default=[
        "full", "no_d_update", "no_regen", "no_adv", "no_stft", "sgd"])
    args = ap.parse_args()
    B, sr, hop = args.batch, 24000, 160
    Tf = sr // hop

    results = {}
    for which in args.variants:
        task = build_task(sr, compute_dtype=jnp.bfloat16)
        if which == "no_adv":
            def step(state, batch, task=task):
                rng, k_sine, k2 = jax.random.split(state.rng, 3)
                grads, metrics = jax.grad(
                    lambda p: task._gen_loss(p, state.d_params, batch,
                                             k_sine, with_adv=False),
                    has_aux=True)(state.g_params)
                updates, g_opt = task.g_tx.update(
                    grads, state.g_opt_state, state.g_params)
                g_params = optax.apply_updates(state.g_params, updates)
                y_hat = jax.lax.stop_gradient(
                    task._forward(g_params, batch, k2))
                d_grads, _ = jax.grad(
                    lambda p: task._dis_loss(p, batch["audio"], y_hat),
                    has_aux=True)(state.d_params)
                d_updates, d_opt = task.d_tx.update(
                    d_grads, state.d_opt_state, state.d_params)
                d_params = optax.apply_updates(state.d_params, d_updates)
                return state.replace(
                    step=state.step + 1, g_params=g_params, g_opt_state=g_opt,
                    d_params=d_params, d_opt_state=d_opt, rng=rng), metrics
            step_fn = step
        elif which == "no_stft":
            task = dataclasses.replace(task, use_stft_loss=False)
            step_fn = task.gan_step
        elif which == "sgd":
            task = dataclasses.replace(
                task, g_tx=optax.sgd(1e-3), d_tx=optax.sgd(1e-3))
            step_fn = task.gan_step
        else:
            step_fn = variant_step(task, which)

        state = task.init_state(jax.random.PRNGKey(0))
        batch = make_batch(jax.random.PRNGKey(1), B, Tf, hop)
        fl = flops_of(jax.jit(step_fn), state, batch)
        t, _, _ = time_train(step_fn, state, batch,
                             k1=args.k1, k2=args.k2, reps=3)
        results[which] = {
            "ms": round(t * 1e3, 2),
            "tflop": round(fl / 1e12, 3) if fl else None,
        }
        print(which, results[which], flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
