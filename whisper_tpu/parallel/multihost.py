"""Multi-host (DCN-connected slices) support: process initialization and
per-host data feeding for the sharded pipelines.

The reference is a single-process CPU binary (SURVEY.md §2.6); this module
is the TPU-pod story. Everything compute-side already works multi-host by
construction — `ShardedPipeline` / `train_step` jit over a `Mesh`, and a
Mesh built from `jax.devices()` spans every process's chips once
`jax.distributed` is initialized; GSPMD then routes intra-slice collectives
over ICI and cross-slice ones over DCN. What a multi-host deployment
actually needs from the framework is:

  1. `initialize()` — one call per process before any jax op (wraps
     `jax.distributed.initialize`; on Cloud TPU pods all arguments are
     discovered from the metadata server / TPU env vars).
  2. `global_batch()` — turn each host's local shard of the request batch
     (audio rows read from that host's queue) into one global jax.Array
     laid out to the mesh's dp axis, via
     `jax.make_array_from_process_local_data`. jit'ing over that array
     then runs ONE program across all hosts.
  3. `is_coordinator()` — gate logging/serving frontends to process 0.

Single-process (and the CI virtual mesh) is the num_processes == 1
degenerate case: initialize() becomes a no-op and global_batch() a
device_put, so the same serving code runs unchanged from laptop CPU to a
multi-host pod.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize cross-process JAX. Call once per process, before any
    other jax API. On Cloud TPU pods, call with no arguments (everything
    is auto-discovered); elsewhere pass the coordinator's host:port and
    this process's rank. No-op when already initialized or when running
    single-process with no arguments.

    ORDER MATTERS: jax.distributed.initialize() must run before anything
    that initializes the XLA backend — including jax.process_count() — so
    the single-process decision is made purely from arguments/env."""
    if (coordinator_address is None and num_processes in (None, 1)
            and process_id is None and not _on_tpu_pod()):
        return                      # single-process run: nothing to do
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:
        if "already" in str(e).lower():
            return                  # idempotent: second call is a no-op
        raise


def _on_tpu_pod() -> bool:
    """True when TPU pod env vars indicate a multi-host slice."""
    import os

    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    return "," in hosts


def is_coordinator() -> bool:
    return jax.process_index() == 0


def global_batch(local_rows: np.ndarray, mesh: Mesh,
                 axis: str = "dp") -> jax.Array:
    """Assemble each process's local batch rows into one globally-sharded
    array on the mesh's data axis.

    Every process passes ITS rows (global_batch_size / num_processes of
    them); the returned jax.Array has global shape
    (num_processes * local_rows.shape[0], ...) sharded P(axis, None, ...)
    and can be fed straight to the jitted sharded pipeline. Single-process
    degenerates to a device_put."""
    local_rows = np.asarray(local_rows)
    spec = P(axis, *([None] * (local_rows.ndim - 1)))
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(local_rows, sharding)
    return jax.make_array_from_process_local_data(sharding, local_rows)


def global_batch_size(local_batch: int) -> int:
    return local_batch * jax.process_count()
