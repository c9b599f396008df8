"""B02 acoustic-model training task (Tacotron2 + MultiSubFreqDiscriminator).

Reference hot loop: /root/reference/harana/bin/train_b02.py:162-260 — masked
MSE on mcep‖bap plus LSGAN adversarial from the sub-frequency discriminator
after discriminator_train_start_steps.

Faithfully kept reference quirk: in the GENERATOR update the discriminator
input is DETACHED (train_b02.py:201: `D(y_[0].detach(), ...)`), so the
adversarial term contributes zero gradient to the generator — it only shows
up in the loss logs. Replicated with stop_gradient so converted training
curves match; the discriminator itself trains normally.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..losses import (
    discriminator_adversarial_loss,
    generator_adversarial_loss,
    masked_mse_loss,
)


@flax.struct.dataclass
class B02TrainState:
    step: jax.Array
    g_params: Any
    g_bn: Any  # batch-norm running stats (non-trainable)
    d_params: Any
    g_opt_state: Any
    d_opt_state: Any
    rng: jax.Array


@dataclass(frozen=True)
class B02TrainTask:
    generator: Any  # Tacotron2 dataclass
    discriminator: Any  # MultiSubFreqDiscriminator dataclass
    g_tx: optax.GradientTransformation
    d_tx: optax.GradientTransformation
    lambda_l1: float = 1.0
    lambda_adv: float = 1.0
    adv_loss_type: str = "mse"
    compute_dtype: Any = None  # e.g. jnp.bfloat16 — params stay f32 in the
    # optimizer, casts are traced (grads flow back f32); losses f32

    def _cast(self, tree):
        if self.compute_dtype is None:
            return tree
        return jax.tree.map(
            lambda x: x.astype(self.compute_dtype)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            tree,
        )

    def init_state(self, key) -> B02TrainState:
        kg, kd, kr = jax.random.split(key, 3)
        g_params = self.generator.init(kg)
        # run one dummy forward to get the bn-state structure
        dummy = {
            "ppg": jnp.zeros((1, 8, self.generator.input_dim)),
            "lft": jnp.zeros((1, 8, 1)),
            "lf0": jnp.zeros((1, 8, 1)),
            "spk_emb": jnp.zeros((1, self.generator.spk_emb_dim)),
            "targets": jnp.zeros(
                (1, 8, self.generator.output_dim + self.generator.bap_out)
            ),
            "lengths": jnp.full((1,), 8, jnp.int32),
        }
        _, _, bn = self.generator.apply(
            g_params, dummy["ppg"], dummy["lengths"], dummy["lft"],
            dummy["lf0"], dummy["spk_emb"], dummy["targets"], train=False,
        )
        # eval-mode new_stats alias the g_params bn leaves; copy them so a
        # donated train step never sees the same buffer via both trees
        bn = jax.tree.map(lambda x: jnp.array(x, copy=True), bn)
        d_params = self.discriminator.init(kd)
        return B02TrainState(
            step=jnp.zeros((), jnp.int32),
            g_params=g_params,
            g_bn=bn,
            d_params=d_params,
            g_opt_state=self.g_tx.init(g_params),
            d_opt_state=self.d_tx.init(d_params),
            rng=kr,
        )

    def _apply_bn(self, params, bn):
        """Overlay running bn stats onto the param tree for eval use."""
        p = jax.tree.map(lambda x: x, params)  # shallow copy via rebuild
        for i, s in enumerate(bn["encoder"]):
            p["encoder"]["convs"][i]["bn"].update(
                {"mean": s["mean"], "var": s["var"]}
            )
        p["bap_decoder"]["bn"].update(
            {"mean": bn["bap"]["mean"], "var": bn["bap"]["var"]}
        )
        return p

    def _forward(self, g_params, batch, key, *, train, teacher_forcing=True,
                 g_bn=None):
        # overlay the ACCUMULATED running bn stats so each train step's
        # momentum update chains on the previous one (torch semantics:
        # running = 0.9*running + 0.1*batch). Train-mode normalization uses
        # batch stats, so this changes no loss or gradient — only the
        # running stats that eval/decode later consume. Overlay AFTER the
        # compute-dtype cast: the stats accumulate in f32 (batch_norm keeps
        # its statistics in f32 regardless of the stream dtype).
        params = self._cast(g_params)
        if g_bn is not None:
            params = self._apply_bn(params, g_bn)
        pred, lens, bn = self.generator.apply(
            params,
            self._cast(batch["ppg"]),
            batch["lengths"],
            self._cast(batch["lft"]),
            self._cast(batch["lf0"]),
            self._cast(batch["spk_emb"]),
            self._cast(batch["targets"]) if teacher_forcing else None,
            train=train,
            key=key,
        )
        # losses (masked MSE / adversarial) stay in f32; bn stats are f32
        return pred.astype(jnp.float32), lens, bn

    def _gen_loss(self, g_params, d_params, batch, key, *, with_adv: bool,
                  train: bool = True, g_bn=None):
        k_fwd, k_d = jax.random.split(key)
        pred, _, bn = self._forward(g_params, batch, k_fwd, train=train,
                                    g_bn=g_bn)
        mse = masked_mse_loss(pred, batch["targets"], batch["lengths"])
        metrics = {"mse_loss": mse}
        gen_loss = self.lambda_l1 * mse
        if with_adv:
            # reference detaches the generator output here (train_b02.py:201)
            p_hat = self.discriminator.apply(
                d_params, jax.lax.stop_gradient(pred), batch["lengths"], k_d
            )
            adv = generator_adversarial_loss(p_hat, loss_type=self.adv_loss_type)
            metrics["adversarial_loss"] = adv
            gen_loss = gen_loss + self.lambda_adv * adv
        metrics["generator_loss"] = gen_loss
        return gen_loss, (metrics, bn)

    def gen_step(self, state: B02TrainState, batch):
        rng, k = jax.random.split(state.rng)
        grads, (metrics, bn) = jax.grad(
            lambda p: self._gen_loss(p, state.d_params, batch, k,
                                     with_adv=False, g_bn=state.g_bn),
            has_aux=True,
        )(state.g_params)
        updates, g_opt = self.g_tx.update(grads, state.g_opt_state, state.g_params)
        g_params = optax.apply_updates(state.g_params, updates)
        return (
            state.replace(step=state.step + 1, g_params=g_params,
                          g_opt_state=g_opt, g_bn=bn, rng=rng),
            metrics,
        )

    def gan_step(self, state: B02TrainState, batch):
        rng, k1, k2, k3 = jax.random.split(state.rng, 4)
        grads, (metrics, bn) = jax.grad(
            lambda p: self._gen_loss(p, state.d_params, batch, k1,
                                     with_adv=True, g_bn=state.g_bn),
            has_aux=True,
        )(state.g_params)
        updates, g_opt = self.g_tx.update(grads, state.g_opt_state, state.g_params)
        g_params = optax.apply_updates(state.g_params, updates)

        # the reference regenerates with the UPDATED generator in train mode
        # (train_b02.py:225-233), which advances the bn running stats a
        # second time — chain that update so running stats match exactly
        pred, _, bn = self._forward(g_params, batch, k2, train=True, g_bn=bn)
        pred = jax.lax.stop_gradient(pred)

        def d_loss(dp):
            kr, kf = jax.random.split(k3)
            p_real = self.discriminator.apply(
                dp, batch["targets"], batch["lengths"], kr
            )
            p_fake = self.discriminator.apply(dp, pred, batch["lengths"], kf)
            real, fake = discriminator_adversarial_loss(
                p_fake, p_real, loss_type=self.adv_loss_type
            )
            return real + fake, {"real_loss": real, "fake_loss": fake,
                                 "discriminator_loss": real + fake}

        d_grads, d_metrics = jax.grad(d_loss, has_aux=True)(state.d_params)
        d_updates, d_opt = self.d_tx.update(
            d_grads, state.d_opt_state, state.d_params
        )
        d_params = optax.apply_updates(state.d_params, d_updates)
        metrics.update(d_metrics)
        return (
            state.replace(step=state.step + 1, g_params=g_params,
                          g_opt_state=g_opt, g_bn=bn, d_params=d_params,
                          d_opt_state=d_opt, rng=rng),
            metrics,
        )

    def eval_step(self, state: B02TrainState, batch):
        _, k = jax.random.split(state.rng)
        _, (metrics, _) = self._gen_loss(
            self._apply_bn(state.g_params, state.g_bn),
            state.d_params, batch, k, with_adv=False, train=False,
        )
        return metrics

    def jit_steps(self, *, donate: bool = True):
        kw = dict(donate_argnums=(0,)) if donate else {}
        return jax.jit(self.gen_step, **kw), jax.jit(self.gan_step, **kw)
