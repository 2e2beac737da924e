"""Device mesh + sharding helpers.

The reference's only parallelism is single-process data parallelism via
``torch.nn.DataParallel`` (train2_seq.py:538) — per-step replicate/scatter/
gather.  The TPU-native equivalent: a 1-D ``('data',)`` mesh over ICI, the
batch sharded with NamedSharding, parameters replicated, and the gradient
all-reduce emitted by XLA inside the single jitted train step.  The same
code spans hosts over DCN after ``jax.distributed.initialize`` (multi-host
processes each contribute their local devices to the same mesh).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Leading (batch) dim sharded across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def spans_processes(mesh: Mesh) -> bool:
    """True when the mesh spans devices of more than one process (multi-host
    DCN run): host arrays are then per-process *local* data and must be
    assembled into global arrays rather than device_put as global values."""
    return jax.process_count() > 1 and any(
        d.process_index != jax.process_index() for d in mesh.devices.flat)


def _put(x, sh: NamedSharding, local: bool):
    if local:
        return jax.make_array_from_process_local_data(sh, np.asarray(x))
    return jax.device_put(x, sh)


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Host arrays -> device arrays with the leading dim sharded.

    Single-process: the array IS the global batch.  Multi-process (after
    ``jax.distributed.initialize``): each process passes its local batch
    rows and the global array is their concatenation along the batch dim —
    the multi-host equivalent of every host's DataLoader feeding its own
    shard (all processes must pass equally-sized local batches)."""
    sh = batch_sharding(mesh, axis_name)
    local = spans_processes(mesh)
    return jax.tree_util.tree_map(lambda x: _put(x, sh, local), batch)


def shard_stacked_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Host arrays with a leading steps axis -> device arrays with the
    SECOND (batch) dim sharded: (K, B, ...) as P(None, 'data').  Used by the
    fused multi-step dispatch (train/steps.py::make_multi_train_step), whose
    lax.scan consumes one leading-axis slice per optimizer step.  Multi-
    process: the batch dim is per-process local, as in shard_batch."""
    sh = NamedSharding(mesh, P(None, axis_name))
    local = spans_processes(mesh)
    return jax.tree_util.tree_map(lambda x: _put(x, sh, local), batch)


def replicate(tree, mesh: Mesh):
    """Replicates every leaf across the mesh.  Multi-process: every process
    must hold the same value (deterministic seeded init guarantees this for
    model/optimizer state); the replicated global array is assembled from
    the per-process copies."""
    sh = replicated(mesh)
    local = spans_processes(mesh)
    return jax.tree_util.tree_map(lambda x: _put(x, sh, local), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return (m - n % m) % m
