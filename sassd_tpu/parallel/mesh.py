"""Device mesh construction and sharding strategies.

The reference's distribution stack — NCCL process groups, DDP wrappers,
coalesced all-reduce, file-barrier eval hooks (/root/reference/tools/env.py:
12-30, mmdet/core/utils/dist_utils.py:9-41) — collapses on TPU to: build a
`jax.sharding.Mesh`, annotate the batch with a NamedSharding over the data
axis, and jit the step. XLA inserts the gradient all-reduce (psum over ICI)
because the loss is a mean over the sharded batch; there is no explicit
collective code to maintain.

Axes:
  data     — batch (pure DP; the reference's only strategy)
  spatial  — optional BEV-row sharding for long-range configs (the analog of
             sequence parallelism for this workload; no reference equivalent)
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None,
              spatial: int = 1) -> Mesh:
    """1-D data mesh (optionally folding off a spatial axis)."""
    devices = jax.devices()
    n = num_devices or len(devices)
    if n % spatial:
        raise ValueError(f"{n} devices not divisible by spatial={spatial}")
    arr = np.array(devices[:n]).reshape(n // spatial, spatial)
    return Mesh(arr, ("data", "spatial"))


def batch_spec() -> P:
    return P("data")


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place a host batch on the mesh, sharded along the data axis.

    Single-process: `batch` is the full global batch, device_put splits it
    across the local devices. Multi-process: `batch` is THIS host's shard
    (global_batch / process_count samples) and the global array is assembled
    from the per-process pieces without any cross-host data movement — the
    multi-host data-parallel contract (each host feeds only its addressable
    devices; the reference ships one DataLoader per NCCL rank instead,
    mmdet/datasets/loader/sampler.py:51-132).
    """
    sh = NamedSharding(mesh, P("data"))
    if jax.process_count() == 1:
        return jax.device_put(batch, sh)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        batch)


def replicate(mesh: Mesh, tree):
    """Replicate params/state/opt_state across the mesh."""
    return jax.device_put(tree, replicated(mesh))


def num_data_shards(mesh: Optional[Mesh]) -> int:
    return 1 if mesh is None else mesh.shape["data"]


def host_shard_info() -> tuple:
    """(num_shards, shard_id) for host-side data sharding.

    Data is sharded across PROCESSES (each loads its slice of every global
    batch), not across devices — within a process, shard_batch splits the
    local slice over the addressable devices.
    """
    return jax.process_count(), jax.process_index()
