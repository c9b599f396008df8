"""FastSVC GAN train step — jitted, phase-separated, mesh-shardable.

Reference hot loop: /root/reference/harana/bin/train_fastsvc.py:157-235.
Two training phases gated on step count (discriminator_train_start_steps,
conf/fastsvc.yaml:110):

  phase "gen"  (step <= start): G update on multi-res STFT loss only.
  phase "gan"  (step >  start): G update on STFT + lambda_adv * adv(D(y_));
               then y_ regenerated with the UPDATED generator (reference's
               "re-compute y_ which leads better quality", :213-215) and a
               D update on real/fake LSGAN losses.

TPU-first design decisions:
  * no Python branching on the step inside jit — the driver picks one of two
    compiled step functions per phase (each is a single XLA program);
  * the sine excitation is generated inside the step from the frame-rate F0
    batch (the reference builds it in the CPU collater, train_fastsvc.py:
    545-546) — cumsum at sample rate is trivial on the VPU and it removes
    a (B, 16000) host->device transfer per step;
  * both G and D phases run under one jit with donated state, so XLA
    overlaps the two backward passes' HBM traffic.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..losses import (
    MultiResolutionSTFTLoss,
    discriminator_adversarial_loss,
    generator_adversarial_loss,
)
from ..ops.signal_gen import SignalGenerator
from .state import GANTrainState


@dataclass(frozen=True)
class FastSVCTrainTask:
    """Bundles models + losses + optimizers into jittable step functions.

    `generator` / `discriminator` are the frozen model dataclasses from
    svcc23_fastsvc_tpu.models; `g_tx` / `d_tx` optax transforms.
    """

    generator: Any
    discriminator: Any
    g_tx: optax.GradientTransformation
    d_tx: optax.GradientTransformation
    signal_generator: SignalGenerator
    stft_loss: MultiResolutionSTFTLoss = MultiResolutionSTFTLoss()
    lambda_adv: float = 2.5
    lambda_aux: float = 1.0
    adv_loss_type: str = "mse"
    use_stft_loss: bool = True
    compute_dtype: Any = None  # e.g. jnp.bfloat16 for mixed precision
    # FiLM fusion on no-grad forwards (D-input regeneration, dumps). The
    # fusion only reassociates the scale/shift sums (parity-tested) but the
    # convergence harness turns it off to keep the op order identical to
    # the reference's plain forward.
    fuse_film_inference: bool = True
    # Mesh axis to pmean gradients/metrics over. None for single-device and
    # GSPMD-sharded jits (where XLA derives the all-reduce from shardings);
    # set to the mesh axis name when the step runs under jax.shard_map
    # (parallel.mesh.shard_map_step_dp) — per-shard grads and batch-mean
    # metrics are explicitly averaged over the data axis, which keeps
    # Pallas kernels usable under DP (GSPMD cannot partition their custom
    # calls, shard_map runs them per-shard on local data).
    pmean_axis: Any = None

    # ------------------------------------------------------------------
    # state
    # ------------------------------------------------------------------

    def init_state(self, key) -> GANTrainState:
        kg, kd, kr = jax.random.split(key, 3)
        return GANTrainState.create(
            g_params=self.generator.init(kg),
            d_params=self.discriminator.init(kd),
            g_tx=self.g_tx,
            d_tx=self.d_tx,
            rng=kr,
        )

    # ------------------------------------------------------------------
    # pieces
    # ------------------------------------------------------------------

    def _cast(self, tree):
        """Cast f32 leaves to the compute dtype (params stay f32 in the
        optimizer; casts are traced, so grads flow back in f32)."""
        if self.compute_dtype is None:
            return tree
        return jax.tree.map(
            lambda x: x.astype(self.compute_dtype)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            tree,
        )

    def _forward(self, g_params, batch, key, *, inference: bool = False):
        """Generator forward. inference=True uses the forward-optimized
        model variant (FiLM fusion) — only valid where no gradient flows
        through this call (the fusion is ~15% faster forward but slower
        backward; numerics identical either way, parity-tested).

        A precomputed batch["sine"] excitation takes precedence over the
        in-step SignalGenerator (the reference's collater-built sine path,
        train_fastsvc.py:545-546 — used by the convergence-parity harness
        to feed bit-identical batches to both frameworks)."""
        import dataclasses

        sine = batch.get("sine")
        if sine is None:
            sine = self.signal_generator(batch["f0"], key)
        model = self.generator
        if (
            inference
            and self.fuse_film_inference
            and getattr(model, "fuse_film", None) is False
        ):
            model = dataclasses.replace(model, fuse_film=True)
        out = model.apply(
            self._cast(g_params),
            self._cast(batch["ppg"]),
            self._cast(sine),
            self._cast(batch["lft"]),
            self._cast(batch.get("spk_emb")),
        )
        # losses (STFT log-magnitude especially) stay in f32
        return out.astype(jnp.float32)

    def _gen_loss(self, g_params, d_params, batch, key, *, with_adv: bool):
        y_hat = self._forward(g_params, batch, key)
        y = batch["audio"]
        metrics = {}
        gen_loss = 0.0
        if self.use_stft_loss:
            # axis_name: under shard_map the spectral-convergence norms are
            # batch-global (psum'd), so the sc VALUE matches the
            # single-program computation exactly. Gradients also come out
            # exact under the caller's pmean: psum transposes to psum in
            # JAX, so each shard's grad is axis_size x its local portion of
            # the full sc gradient, and pmean reconstructs the full sum
            # (verified empirically against the single-program grad).
            sc, mag = self.stft_loss(
                y_hat[..., 0], y[..., 0], axis_name=self.pmean_axis
            )
            gen_loss = sc + mag
            metrics["spectral_convergence_loss"] = sc
            metrics["log_stft_magnitude_loss"] = mag
        gen_loss = gen_loss * self.lambda_aux
        if with_adv:
            p_hat = self.discriminator.apply(
                self._cast(d_params), self._cast(y_hat)
            )
            p_hat = jax.tree.map(lambda t: t.astype(jnp.float32), p_hat)
            adv = generator_adversarial_loss(p_hat, loss_type=self.adv_loss_type)
            metrics["adversarial_loss"] = adv
            gen_loss = gen_loss + self.lambda_adv * adv
        metrics["generator_loss"] = gen_loss
        return gen_loss, metrics

    def _dis_loss(self, d_params, y, y_hat):
        dp = self._cast(d_params)
        # One (2B) pass over real|fake instead of two B passes: the waveform
        # discriminators are batch-independent (convs/pools only), so the
        # per-sample outputs are identical, while the backward contracts ONE
        # weight grad over 2B instead of two + add (the profiled step had
        # every discriminator wgrad fusion duplicated at ~64 GiB/s).
        B = y.shape[0]
        both = jnp.concatenate([self._cast(y), self._cast(y_hat)], axis=0)
        p_both = self.discriminator.apply(dp, both)
        p = jax.tree.map(lambda t: t[:B].astype(jnp.float32), p_both)
        p_hat = jax.tree.map(lambda t: t[B:].astype(jnp.float32), p_both)
        real, fake = discriminator_adversarial_loss(
            p_hat, p, loss_type=self.adv_loss_type
        )
        return real + fake, {"real_loss": real, "fake_loss": fake,
                             "discriminator_loss": real + fake}

    # ------------------------------------------------------------------
    # step functions (jit these; see jit_steps)
    # ------------------------------------------------------------------

    def _pmean(self, tree):
        """Average a pytree over the data axis under shard_map; identity
        otherwise (GSPMD inserts the equivalent all-reduce itself)."""
        if self.pmean_axis is None:
            return tree
        return jax.lax.pmean(tree, self.pmean_axis)

    def _unwire(self, batch):
        """Invert the host->device transfer wire format (data/wire.py:
        int16 audio, bf16 ppg, frame-rate lft) inside the jitted step.
        Idempotent — plain f32 batches pass through untouched, so eval
        and dump paths need no flag."""
        from ..data.wire import unpack_batch

        return unpack_batch(
            batch, hop_size=self.signal_generator.hop_size
        )

    def gen_step(self, state: GANTrainState, batch) -> tuple:
        """Phase A: generator-only update."""
        batch = self._unwire(batch)
        rng, k_sine = jax.random.split(state.rng)
        grads, metrics = jax.grad(
            lambda p: self._gen_loss(p, state.d_params, batch, k_sine, with_adv=False),
            has_aux=True,
        )(state.g_params)
        grads, metrics = self._pmean((grads, metrics))
        updates, g_opt_state = self.g_tx.update(
            grads, state.g_opt_state, state.g_params
        )
        g_params = optax.apply_updates(state.g_params, updates)
        new_state = state.replace(
            step=state.step + 1, g_params=g_params,
            g_opt_state=g_opt_state, rng=rng,
        )
        return new_state, metrics

    def gan_step(self, state: GANTrainState, batch) -> tuple:
        """Phase B: generator update with adversarial term + D update."""
        batch = self._unwire(batch)
        rng, k_sine = jax.random.split(state.rng)
        grads, metrics = jax.grad(
            lambda p: self._gen_loss(p, state.d_params, batch, k_sine, with_adv=True),
            has_aux=True,
        )(state.g_params)
        grads, metrics = self._pmean((grads, metrics))
        updates, g_opt_state = self.g_tx.update(
            grads, state.g_opt_state, state.g_params
        )
        g_params = optax.apply_updates(state.g_params, updates)

        # regenerate with the updated generator, grads stopped (ref :213-215).
        # The reference reuses the SAME input batch — including the sine
        # excitation built once per batch in the collater — for both the G
        # update and the regeneration, so the same k_sine is reused here.
        # No gradient flows through this forward, so the inference-optimized
        # variant is safe here.
        y_hat = jax.lax.stop_gradient(
            self._forward(g_params, batch, k_sine, inference=True)
        )
        d_grads, d_metrics = jax.grad(
            lambda p: self._dis_loss(p, batch["audio"], y_hat), has_aux=True
        )(state.d_params)
        d_grads, d_metrics = self._pmean((d_grads, d_metrics))
        d_updates, d_opt_state = self.d_tx.update(
            d_grads, state.d_opt_state, state.d_params
        )
        d_params = optax.apply_updates(state.d_params, d_updates)

        metrics.update(d_metrics)
        new_state = state.replace(
            step=state.step + 1,
            g_params=g_params, g_opt_state=g_opt_state,
            d_params=d_params, d_opt_state=d_opt_state,
            rng=rng,
        )
        return new_state, metrics

    def eval_step(self, state: GANTrainState, batch, *, with_adv: bool = True):
        """Loss evaluation without updates (reference _eval_step)."""
        batch = self._unwire(batch)
        _, k_sine = jax.random.split(state.rng)
        _, metrics = self._gen_loss(
            state.g_params, state.d_params, batch, k_sine, with_adv=with_adv
        )
        if with_adv:
            y_hat = self._forward(state.g_params, batch, k_sine)
            _, d_metrics = self._dis_loss(state.d_params, batch["audio"], y_hat)
            metrics.update(d_metrics)
        return metrics

    # ------------------------------------------------------------------

    def jit_steps(self, *, donate: bool = True):
        """Return (gen_step, gan_step) jitted with state donation."""
        kw = dict(donate_argnums=(0,)) if donate else {}
        return (
            jax.jit(self.gen_step, **kw),
            jax.jit(self.gan_step, **kw),
        )


def make_multi_step(step_fn):
    """Wrap a (state, batch) step into (state, batches) scanning K steps in
    ONE device program. Batches are stacked on a leading K axis.

    Amortizes host->device dispatch across K steps — on dispatch-latency
    limited links (remote tunnels; many tiny models per chip) this is the
    difference between RPC-bound and compute-bound throughput. Metrics are
    returned per-step (K, ...).
    """

    def multi_step(state, batches):
        def body(s, b):
            s2, m = step_fn(s, b)
            return s2, m

        return jax.lax.scan(body, state, batches)

    return multi_step
