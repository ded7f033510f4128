"""Device mesh + sharding helpers (the TPU answer to the reference's
DDP/NCCL runtime, train.py:62-144 and helpers.py:72-90).

The reference's only parallelism is data parallelism: NCCL process group,
DistributedDataParallel gradient all-reduce, DistributedSampler, and
all_reduce-mean for logging.  Here the same capability is one 1-D
`jax.sharding.Mesh` over all devices ('data' axis):

  * batch arrays are sharded on 'data' (ICI within a slice, DCN across
    slices when multi-host);
  * params/optimizer state are replicated; jit inserts the gradient
    all-reduce (psum) automatically — DDP's backward hook for free;
  * the loss-logging all_reduce (helpers.py:76-90) falls out of the same
    compiled graph (metrics are means over the global batch).

Multi-host: call `init_distributed()` once per process (the env:// NCCL
rendezvous equivalent, train.py:65-67); each process feeds its local shard
via `shard_batch` — the DistributedSampler equivalent is
data.sharded_indices (per-process strided view).

TP/PP/EP are intentionally absent: the reference has none (SURVEY §2.5) and
these are ~35M-param convnets; the sequence axis (video time) is handled by
the fixed-capacity memory bank + blockwise Pallas attention instead of
cross-chip context parallelism.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed() -> None:
    """Multi-host bring-up; no-op for single-process runs."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree with its leading axis sharded on 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)
