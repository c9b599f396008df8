"""Data-parallel training over a jax.sharding.Mesh.

The reference has no distributed layer at all (SURVEY.md §2g: single-process,
single-GPU; its only parallelism is shell-level scp-shard job arrays). The
TPU-native replacement: utterance-batch data parallelism via jit over a 1-D
("data",) mesh — batch sharded on the data axis, train state replicated, and
XLA's SPMD partitioner inserts the gradient all-reduce over ICI.

The models are <10 M params (FastSVC generator ~5 M), so DP is the entire
scaling story; there is nothing to tensor/pipeline-parallelize. For
multi-host slices the same code runs under jax.distributed.initialize with
per-host data feeding (jax.make_array_from_process_local_data).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, *, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first n_devices devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if len(devices) < n_devices:
        raise ValueError(
            f"requested {n_devices} devices but only {len(devices)} present"
        )
    return Mesh(np.array(devices[:n_devices]), (axis_name,))


def shard_batch(batch, mesh: Mesh, *, axis_name: str = "data"):
    """Place a host-local batch dict sharded along the leading batch axis."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (train state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def jit_train_step_dp(step_fn, mesh: Mesh, *, axis_name: str = "data",
                      donate: bool = True):
    """jit a (state, batch) -> (state, metrics) step for DP over `mesh`.

    State replicated, batch sharded on the leading axis; outputs replicated.
    XLA SPMD derives the gradient all-reduce from these shardings.
    """
    from ..ops.conv import set_pallas_conv_mode

    # The fused Pallas conv is a custom call GSPMD cannot partition along
    # the sharded batch axis — force the XLA lowerings before tracing.
    set_pallas_conv_mode("0")
    state_sh = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(axis_name))
    kw = dict(donate_argnums=(0,)) if donate else {}
    return jax.jit(
        step_fn,
        in_shardings=(state_sh, batch_sh),
        out_shardings=(state_sh, state_sh),
        **kw,
    )


def shard_map_step_dp(task, phase: str, mesh: Mesh, *,
                      axis_name: str = "data", donate: bool = True,
                      multi_step: bool = False):
    """DP step via jax.shard_map instead of GSPMD shardings.

    Each shard runs the full step on its local batch rows with gradients
    and metrics explicitly pmean'd over `axis_name` (the task's
    `pmean_axis` hook). Numerically identical to jit_train_step_dp for a
    deterministic step (exact-equality tested); with per-batch noise the
    shards draw from the same key so the noise layout differs from the
    single-program GSPMD trace (statistically equivalent).

    Why it exists: GSPMD cannot partition Pallas custom calls along the
    sharded batch axis, so the GSPMD path forces the XLA conv lowerings.
    Under shard_map the kernel body is manual per-shard code — the fused
    Pallas convs run as-is on local data, composing the kernel wins with
    data parallelism.
    """
    import dataclasses

    task_p = dataclasses.replace(task, pmean_axis=axis_name)
    step = getattr(task_p, f"{phase}_step")
    if multi_step:
        from ..train.gan import make_multi_step

        step = make_multi_step(step)
        batch_spec = P(None, axis_name)
    else:
        batch_spec = P(axis_name)
    # check_vma off: the model's custom-VJP ops (rfft STFT loss, the fused
    # Pallas convs) don't declare varying-manual-axes types, and the vma
    # typechecker rejects their cotangents under shard_map. The replicated
    # out_specs are guaranteed by the explicit pmean instead.
    fn = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(), batch_spec),
        out_specs=(P(), P()),
        check_vma=False,
    )
    kw = dict(donate_argnums=(0,)) if donate else {}
    return jax.jit(fn, **kw)


def shard_map_forward_dp(forward_fn, mesh: Mesh, *, axis_name: str = "data"):
    """DP inference via jax.shard_map: (params, *batch_args) -> output with
    params replicated and every batch arg/output sharded on its leading
    axis. The Pallas-kernel-compatible decode/synthesis path (GSPMD cannot
    partition the fused custom calls; per-shard manual code can)."""

    def wrapped(params, *args):
        return forward_fn(params, *args)

    def jitted(params, *args):
        fn = jax.shard_map(
            wrapped, mesh=mesh,
            in_specs=(P(),) + (P(axis_name),) * len(args),
            out_specs=P(axis_name),
            check_vma=False,
        )
        return fn(params, *args)

    return jax.jit(jitted)


def shard_stacked_batch(batches, mesh: Mesh, *, axis_name: str = "data"):
    """Place a K-stacked batch dict (leading scan axis K, then batch axis)
    with the batch axis sharded over the mesh and the scan axis replicated."""
    sharding = NamedSharding(mesh, P(None, axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batches)


def jit_multi_step_dp(step_fn, mesh: Mesh, *, axis_name: str = "data",
                      donate: bool = True):
    """jit a K-step lax.scan over `step_fn` for DP over `mesh`.

    Composes dispatch amortization (steps_per_call) with data parallelism:
    the scanned program is one XLA executable whose per-step gradient
    all-reduce over the data axis is derived from the shardings, exactly as
    in jit_train_step_dp. Stacked batches carry a leading K scan axis
    (replicated) with the batch axis sharded; per-step metrics come back
    stacked (K, ...) and replicated.
    """
    from ..train.gan import make_multi_step
    from ..ops.conv import set_pallas_conv_mode

    set_pallas_conv_mode("0")  # see jit_train_step_dp
    state_sh = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(None, axis_name))
    kw = dict(donate_argnums=(0,)) if donate else {}
    return jax.jit(
        make_multi_step(step_fn),
        in_shardings=(state_sh, batch_sh),
        out_shardings=(state_sh, state_sh),
        **kw,
    )
