"""Point-axis-sharded Splat/Slice via shard_map — this workload's analog of
sequence parallelism (SURVEY.md §2.3).

Splat is a commutative scatter-max into a zero-initialized grid: each device
splats its local point shard (all entries >= 0), then a ``lax.pmax`` over the
'points' mesh axis combines the partial lattices into the exact global grid.
Slice needs the full grid but only local points, so it is collective-free
with the grid replicated across 'points'.

Unlike GSPMD auto-partitioning (which replicates the inputs of an opaque
pallas_call), shard_map runs the Pallas kernel per-device on the local shard
— the kernel itself executes under real partitioning.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from cloud_transformers_tpu.core.grid_mapping import GridMapping
from cloud_transformers_tpu.core.splat_slice import (
    slice_grid_mapping,
    splat_max_mapping,
)

_MAP_SPEC = GridMapping(P(None, "points", None), P(None, "points", None),
                        P(None, "points", None, None),
                        P(None, "points", None, None))


def splat_max_point_sharded(mesh, mapping, values, sizes, pts_mask=None):
    """``splat_max_mapping`` with the point axis sharded over mesh axis
    'points'.  Returns the exact global grid, replicated over 'points'."""
    sizes = tuple(sizes)
    has_mask = pts_mask is not None

    def local(mapping, values, *mask):
        grid = splat_max_mapping(mapping, values, sizes,
                                 pts_mask=mask[0] if has_mask else None)
        # max-combine the partial lattices; all_gather+max instead of
        # lax.pmax because pmax has no differentiation rule — the max VJP
        # routes the cotangent to the winning device's contribution,
        # matching the single-device argmax semantics
        gathered = jax.lax.all_gather(grid, "points")   # [np, B, H, G, F]
        return jnp.max(gathered, axis=0)

    in_specs = (_MAP_SPEC, P(None, "points", None))
    args = (mapping, values)
    if has_mask:
        in_specs += (P(None, "points"),)
        args += (pts_mask,)
    return shard_map(local, mesh=mesh, in_specs=in_specs,
                     out_specs=P(None, None, None, None),
                     check_rep=False)(*args)


def slice_grid_point_sharded(mesh, mapping, grid, sizes, pts_mask=None):
    """``slice_grid_mapping`` with points sharded over 'points'; the grid is
    replicated, the output is point-sharded.  Collective-free."""
    sizes = tuple(sizes)
    has_mask = pts_mask is not None

    def local(mapping, grid, *mask):
        return slice_grid_mapping(mapping, grid, sizes,
                                  pts_mask=mask[0] if has_mask else None)

    in_specs = (_MAP_SPEC, P(None, None, None, None))
    args = (mapping, grid)
    if has_mask:
        in_specs += (P(None, "points"),)
        args += (pts_mask,)
    return shard_map(local, mesh=mesh, in_specs=in_specs,
                     out_specs=P(None, "points", None),
                     check_rep=False)(*args)
