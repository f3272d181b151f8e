"""Device mesh + sharding utilities.

The reference's only parallelism is data-parallel DDP over NCCL
(run_ddp.py:33-108).  The TPU-native equivalent is GSPMD: one jitted
train step over a 1-D ``Mesh(devices, ('data',))`` with the batch
sharded on axis 0 and parameters replicated.  XLA inserts the gradient
all-reduce over ICI automatically, and because batch statistics are
computed on the *global* (sharded) batch inside the program, BatchNorm
is synchronous across replicas by construction — the semantics
run_ddp.py:103-104 opts into with SyncBatchNorm.

Multi-host: per-host data loading + ``host_local_batch_to_global``
(jax.make_array_from_process_local_data) replaces DistributedSampler
sharding (run_ddp.py:60-76).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = "data") -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Place a host-local batch pytree sharded along axis 0."""
    sharding = NamedSharding(mesh, P(axis_name))

    def put(x):
        x = np.asarray(x)
        spec = P(axis_name) if x.ndim >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def host_local_batch_to_global(batch: Any, mesh: Mesh,
                               axis_name: str = "data") -> Any:
    """Multi-host: assemble per-process shards into global arrays."""
    def put(x):
        x = np.asarray(x)
        spec = P(axis_name) if x.ndim >= 1 else P()
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), x)
    return jax.tree_util.tree_map(put, batch)


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host rendezvous: jax.distributed.initialize (replaces the
    reference's SLURM env parsing + torch file:// rendezvous,
    run_ddp.py:33-42).  With no arguments JAX auto-detects the TPU pod
    environment."""
    import jax
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
