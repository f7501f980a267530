"""Device mesh and sharding utilities.

The reference's only parallelism is multi-process DDP over NCCL
(SURVEY.md §2.3).  The TPU-native equivalent is a ``jax.sharding.Mesh`` with
the batch sharded over a ``data`` axis: gradients all-reduce, BatchNorm
statistics become global (SyncBN semantics), and metric reductions stay on
device — all inserted by GSPMD, no explicit collectives in model code.

An extra ``points`` axis is supported for sharding the point dimension of
large clouds (the workload's analog of sequence parallelism): Splat is a
commutative scatter-max, so points can splat locally and the lattices combine
with a max all-reduce — GSPMD derives exactly that from the shardings.
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_points: int = 1,
              devices=None) -> Mesh:
    """1- or 2-axis mesh ('data'[, 'points']) over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_points
    devs = np.asarray(devices[: n_data * n_points]).reshape(n_data, n_points)
    return Mesh(devs, ("data", "points"))


def data_sharding(mesh: Mesh, batch_axis: int = 0, points_axis: Optional[int] = None):
    """NamedSharding that shards ``batch_axis`` over 'data' (and optionally a
    point axis over 'points')."""
    ndim = max(batch_axis, points_axis or 0) + 1
    spec = [None] * ndim
    spec[batch_axis] = "data"
    if points_axis is not None:
        spec[points_axis] = "points"
    return NamedSharding(mesh, P(*spec))


def shard_batch(mesh: Mesh, batch, points_axis: Optional[int] = None):
    """Device-put a pytree of host arrays with the batch dim sharded on
    'data'.

    Multi-process: each process passes its PROCESS-LOCAL batch shard (the
    DataLoader shards the index space per process, data/loader.py) and the
    global array is assembled with ``make_array_from_process_local_data`` —
    the DistributedSampler+DDP equivalent.  Single-process ``device_put``
    keeps the donation-friendly fast path."""
    multiproc = jax.process_count() > 1

    def put(x):
        spec = [None] * x.ndim
        spec[0] = "data"
        if points_axis is not None and x.ndim > points_axis:
            spec[points_axis] = "points"
        s = NamedSharding(mesh, P(*spec))
        if multiproc:
            return jax.make_array_from_process_local_data(s, x)
        return jax.device_put(x, s)

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    """Device-put a pytree fully replicated over the mesh."""
    s = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
