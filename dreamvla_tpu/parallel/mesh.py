"""Device mesh + sharding helpers.

Replaces the reference's torch.distributed/NCCL layer
(`utils/distributed_utils.py`: env/SLURM rank discovery, init_process_group,
DDP wrap, DistributedSampler). In JAX the equivalents are:

  * `jax.distributed.initialize()` for multi-host process bootstrap
    (replaces init_process_group — call `init_multihost()` once per process);
  * a `Mesh` over all devices with a 1-D 'dp' axis (extend with 'fsdp'/'tp'
    axes as the model grows) — gradient psum rides ICI within a slice, DCN
    across slices, orchestrated by XLA instead of NCCL;
  * `NamedSharding` annotations instead of DistributedSampler: each host
    feeds its local batch shard, `jax.make_array_from_process_local_data`
    assembles the global array.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_multihost(coordinator: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> None:
    """Multi-host bootstrap (reference init_distributed_device analogue).

    No-ops on single-process runs; honours JAX_COORDINATOR_ADDRESS / SLURM /
    TPU-pod auto-detection when arguments are omitted.
    """
    explicit = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if explicit or int(os.environ.get("SLURM_NTASKS", "1")) > 1:
        jax.distributed.initialize(
            coordinator_address=explicit,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_mesh(axes: Sequence[str] = ("dp",),
              shape: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    """Mesh over all (or given) devices; default a 1-D data-parallel axis."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = [len(devices)] + [1] * (len(axes) - 1)
    return Mesh(devices.reshape(shape), axis_names=tuple(axes))


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Leading-axis (batch) sharding over the dp axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "dp", batch_dim: int = 1):
    """Device-put a host batch dict sharded over `axis` at `batch_dim`.

    Default batch_dim=1 matches the train step's (accum, batch, ...) layout;
    pass batch_dim=0 for plain batches. Single-host only — on pods use
    `global_batch_from_local` (each process holds its own shard).
    """
    spec = P(*([None] * batch_dim + [axis]))
    sh = NamedSharding(mesh, spec)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def global_batch_from_local(mesh: Mesh, local_batch, axis: str = "dp",
                            batch_dim: int = 1):
    """Assemble a global sharded batch from per-process local shards
    (multi-host pods: each host's loader yields its ShardedSampler shard;
    replaces the reference's DistributedSampler + per-rank tensors)."""
    spec = P(*([None] * batch_dim + [axis]))
    sh = NamedSharding(mesh, spec)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, x), local_batch)
