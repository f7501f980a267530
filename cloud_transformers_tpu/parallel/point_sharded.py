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


def shard_map(f, *, mesh, in_specs, out_specs, check_rep=False):
    """jax.shard_map (the jax.experimental.shard_map import is deprecated);
    check_rep was renamed check_vma upstream."""
    return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=check_rep)

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


def chamfer_point_sharded(mesh, xyz1, xyz2, chunk_size=1024,
                          valid1=None, valid2=None):
    """``losses.chamfer.chamfer_distance`` with BOTH clouds' point axes
    sharded over mesh axis 'points' — the multi-chip eval path for the
    completion protocol's 16k x 16k NN searches.

    Each device runs the O(N_local * M) tiled NN search for its local query
    shard against the full other cloud (rebuilt with one ``all_gather`` over
    'points', riding ICI); the MXU distance work — the dominant cost — is
    split ``n_points`` ways.  Returned distances/indices are point-sharded
    along axis 1 and differentiable in both clouds (the all_gather transpose
    scatters NN-gradient contributions back to the owning shard).

    Semantics identical to the single-device ``chamfer_distance`` (reference
    chamfer.cu:136-195): squared distances, argmin indices are GLOBAL row
    ids (block-ordered all_gather reconstructs the global point order).
    """
    from cloud_transformers_tpu.losses.chamfer import _nn_idx_chunked

    has1 = valid1 is not None
    has2 = valid2 is not None

    def local(x, y, *masks):
        m1 = masks[0] if has1 else None
        m2 = masks[has1] if has2 else None
        y_full = jax.lax.all_gather(y, "points", axis=1, tiled=True)
        x_full = jax.lax.all_gather(x, "points", axis=1, tiled=True)
        m1_full = (jax.lax.all_gather(m1, "points", axis=1, tiled=True)
                   if has1 else None)
        m2_full = (jax.lax.all_gather(m2, "points", axis=1, tiled=True)
                   if has2 else None)

        idx1 = _nn_idx_chunked(x, y_full, chunk_size, y_valid=m2_full)
        idx2 = _nn_idx_chunked(y, x_full, chunk_size, y_valid=m1_full)
        nn1 = jnp.take_along_axis(y_full, idx1[..., None], axis=1)
        nn2 = jnp.take_along_axis(x_full, idx2[..., None], axis=1)
        dist1 = jnp.sum((x - nn1) ** 2, axis=-1)
        dist2 = jnp.sum((y - nn2) ** 2, axis=-1)
        if has1:
            dist1 = jnp.where(m1, dist1, 0.0)
        if has2:
            dist2 = jnp.where(m2, dist2, 0.0)
        return dist1, dist2, idx1, idx2

    in_specs = [P(None, "points", None), P(None, "points", None)]
    args = [xyz1, xyz2]
    if has1:
        in_specs.append(P(None, "points"))
        args.append(valid1)
    if has2:
        in_specs.append(P(None, "points"))
        args.append(valid2)
    out_specs = (P(None, "points"), P(None, "points"),
                 P(None, "points"), P(None, "points"))
    return shard_map(local, mesh=mesh, in_specs=tuple(in_specs),
                     out_specs=out_specs, check_rep=False)(*args)


def f_score_point_sharded(mesh, pred, gt, threshold=0.01, chunk_size=1024,
                          valid_pred=None, valid_gt=None):
    """``losses.fscore.f_score`` with the NN searches point-sharded over
    'points' (see ``chamfer_point_sharded``); the threshold statistics are
    computed on the (logically global) sharded distance arrays."""
    from cloud_transformers_tpu.losses.fscore import f_score_from_dists

    d1, d2, _, _ = chamfer_point_sharded(mesh, pred, gt, chunk_size,
                                         valid1=valid_pred, valid2=valid_gt)
    return f_score_from_dists(d1, d2, threshold, valid_pred, valid_gt)
