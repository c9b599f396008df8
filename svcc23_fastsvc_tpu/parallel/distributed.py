"""Multi-host data-parallel training glue.

The reference's only parallelism is shell-level scp-shard job arrays
(SURVEY.md §2g / §5). The TPU-native replacement for multi-host slices:

  * `initialize()` wraps jax.distributed.initialize (coordinator discovery
    via env or args) — call once per host process before any jax op;
  * `HostShardedBatcher` gives each host an independent slice of the random
    stream (seed offset by process index), so hosts build disjoint local
    batches without communication;
  * `global_batch()` assembles the per-host local batch into one global
    jax.Array laid out over the mesh's data axis via
    jax.make_array_from_process_local_data — the jit'd DP step then runs
    unchanged, with gradient all-reduce over ICI within a slice and DCN
    across slices, all inserted by XLA's SPMD partitioner.

Single-host runs don't need any of this; jit_train_step_dp alone suffices.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """Initialize the jax distributed runtime (no-op if single process)."""
    num_processes = num_processes or int(os.environ.get("SVC_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        logging.info("single-process run; skipping jax.distributed")
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("SVC_COORDINATOR", "127.0.0.1:12345"),
        num_processes=num_processes,
        process_id=process_id
        if process_id is not None
        else int(os.environ.get("SVC_PROCESS_ID", "0")),
    )
    logging.info(
        "jax.distributed up: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


class HostShardedBatcher:
    """Wrap a batcher so each host draws an independent seeded stream and
    builds only its local shard of the global batch."""

    def __init__(self, make_batcher, *, seed: int = 0):
        """make_batcher(local_batch_size, seed) -> iterable of batch dicts."""
        self.process_index = jax.process_index()
        self.batcher = make_batcher(seed + 1000 * self.process_index)

    def __iter__(self):
        return iter(self.batcher)


def global_batch(local_batch: dict, mesh: Mesh, *, axis_name: str = "data"):
    """Per-host local batch dict -> global jax.Arrays sharded on the data
    axis (each host contributes its local rows)."""
    sharding = NamedSharding(mesh, P(axis_name))
    return {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in local_batch.items()
    }


def global_stacked_batch(local_batches: dict, mesh: Mesh, *,
                         axis_name: str = "data"):
    """K-stacked per-host batches (leading scan axis K, then the local batch
    axis) -> global jax.Arrays with the scan axis replicated and the batch
    axis sharded over the data axis — the multi-host feed for the scanned
    steps_per_call dispatch (jit_multi_step_dp)."""
    sharding = NamedSharding(mesh, P(None, axis_name))
    return {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in local_batches.items()
    }
