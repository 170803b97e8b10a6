"""Device mesh and sharding helpers.

TPU-native replacement for the reference's process-per-GPU NCCL DDP
stack (reference: train.py:20-43,223-229 spawns one OS process per GPU,
wraps the backbone in DistributedDataParallel, and all-reduces grads via
NCCL). Here a single process drives all local chips through SPMD:

  * one 1-D ``data`` mesh over all devices,
  * the batch is sharded over ``data``; params/EMA/optimizer state are
    replicated,
  * XLA inserts the gradient psum over ICI automatically from the
    shardings — there is no hand-written collective,
  * multi-host scaling uses ``jax.distributed.initialize`` +
    ``jax.make_mesh`` over the global device set (replacing mp.spawn +
    DistributedSampler).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_data_mesh(num_devices: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data mesh."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch pytree onto the mesh, batch-axis sharded."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host rendezvous (replaces the reference's env-var NCCL
    rendezvous, train.py:36-38). No-op on a single host."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
