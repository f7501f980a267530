"""Scatter-free segment reductions for the splat/slice hot path.

Why: XLA's TPU scatter lowers to a serialized read-modify-write loop
(~40 cycles/update measured on v5e — ~87 ms for the 2M-update splat of one
block group), and `searchsorted` is worse.  Sorts (~6 ms), scans (~4 ms) and
gathers (~2 cycles/row) are the fast primitives.  So the dense
"segment-reduce into a grid" is reformulated with *no scatter at all*:

1. concatenate the K data elements with G *query* sentinels (one per grid
   cell), keyed so a query sorts immediately AFTER its cell's data
   (key = 2*cell for data, 2*cell+1 for queries);
2. one stable multi-operand `lax.sort` orders everything by cell;
3. an inclusive segmented scan (max or sum) makes each query element carry
   the reduction over its cell's data;
4. a second stable sort on the is-query bit compacts the G query elements —
   which appear in cell order — to the front: rows [0, G) ARE the dense grid.

This replaces torch_scatter.scatter_max (reference layers/cloud_transform.py:
171-173) with identical forward semantics (zero-initialized grid clamps
negative maxima to 0) at ~3-5x the throughput of XLA scatter on v5e, and the
same machinery with a sum combiner serves as the transpose of the slice
gather (the scatter-add in the backward pass).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# plain float: a module-level jnp scalar would initialise the XLA
# backend at import time, breaking jax.distributed.initialize in
# the multi-host CLIs (parallel/distributed.py)
_NEG = np.float32(-3.0e38)


def _segmented_scan(cells, vals, combine_op):
    """Inclusive scan of ``vals [R, N, F]`` along axis 1 that resets whenever
    ``cells [R, N]`` changes (cells must be sorted per row)."""

    def comb(a, b):
        ca, va = a
        cb, vb = b
        keep = (ca == cb)[..., None]
        return cb, jnp.where(keep, combine_op(va, vb), vb)

    _, out = jax.lax.associative_scan(comb, (cells, vals), axis=1)
    return out


@partial(jax.jit, static_argnames=("grid_cells", "op"))
def segment_reduce_dense(idx, vals, grid_cells, op="max"):
    """Dense per-cell reduction without scatter.

    Args:
      idx: [R, K] int32 cell ids in [0, grid_cells).
      vals: [R, K, F] float32 values.
      grid_cells: G.
      op: 'max' (identity -inf, result clamped at 0 — splat semantics) or
        'sum' (identity 0).

    Returns:
      grid [R, G, F] where grid[r, c] = op over vals[r, k] with idx[r, k]==c
      (for 'max': additionally clamped to >= 0; empty cells are 0).
    """
    r, k, f = vals.shape
    g = grid_cells
    identity = jnp.float32(_NEG if op == "max" else 0.0)
    combine = jnp.maximum if op == "max" else jnp.add

    # data sorts before its cell's query; the LSB doubles as the is-query bit
    data_key = idx * 2
    query_key = jnp.broadcast_to(
        jnp.arange(g, dtype=jnp.int32)[None] * 2 + 1, (r, g))
    keys = jnp.concatenate([data_key, query_key], axis=1)  # [R, K+G]
    channels = tuple(
        jnp.concatenate([vals[..., i],
                         jnp.full((r, g), identity)], axis=1)
        for i in range(f))

    sorted_ops = jax.lax.sort((keys,) + channels, dimension=1,
                              num_keys=1, is_stable=True)
    skeys = sorted_ops[0]
    svals = jnp.stack(sorted_ops[1:], axis=-1)  # [R, K+G, F]

    cells = skeys >> 1
    scanned = _segmented_scan(cells, svals, combine)

    # compact the G query rows (already in cell order) to the front:
    # second stable sort on the inverted is-query bit (0 for queries).
    extract = jax.lax.sort(
        (1 - (skeys & 1),) + tuple(scanned[..., i] for i in range(f)),
        dimension=1, num_keys=1, is_stable=True)
    grid = jnp.stack(extract[1:], axis=-1)[:, :g, :]

    if op == "max":
        grid = jnp.maximum(grid, 0.0)  # zero-init clamp (reference N4)
    return grid
