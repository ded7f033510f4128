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
    """Place a host batch pytree with its leading axis sharded on 'data'.

    Single-process: a plain device_put suffices (the host array IS the
    global batch).  Multi-process: each process holds only its local shard
    (global_batch // process_count rows, fed by data.epoch_indices'
    per-process striding — the DistributedSampler equivalent), so the
    global array must be assembled with
    `jax.make_array_from_process_local_data`, which maps local rows onto
    this process's addressable devices and records the global shape."""
    sh = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        batch)


def host_local(x) -> np.ndarray:
    """This process's addressable rows of a batch-sharded array (the whole
    array when single-process) — for host-side metrics like the s1 IoU."""
    if jax.process_count() == 1:
        return np.asarray(x)
    shards = sorted(x.addressable_shards,
                    key=lambda s: (s.index[0].start or 0))
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree over the whole mesh.  Multi-process: every process
    holds the same values (same-seed init / same checkpoint), so the local
    data IS the global data for a fully-replicated sharding."""
    rep = replicated(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(rep, np.asarray(x)),
        tree)
