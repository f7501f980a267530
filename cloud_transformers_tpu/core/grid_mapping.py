"""GridMapping: the point->cell-vertex relation in kernel-friendly form.

Instead of the reference's (weights [.., S], flat_index [.., S]) pair
(layers/cloud_transform.py:72-121), the mapping keeps per-point base
coordinates and per-vertex weights split by x-row:

  x0     [B, P, H]     first-axis base cell
  lane0  [B, P, H]     flattened remaining-axes base (y0, or y0*Z+z0)
  w_lo   [B, P, H, 4]  vertex weights for row x0   (2D: [w00, w01, 0, 0])
  w_hi   [B, P, H, 4]  vertex weights for row x0+1 (3D offsets [0,1,Z,Z+1])

which feeds the Pallas splat kernel directly and reconstructs flat indices /
reference-ordered weights with cheap arithmetic.  Gradient balancing
(cloud_transform.py:12-26) is applied to the scaled keys before the floor, so
weight gradients stay resolution-independent.
"""

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cloud_transformers_tpu.core.balance import balance_op
from cloud_transformers_tpu.ops.pallas_splat import vertex_decomposition

_EPS = 1e-7


class GridMapping(NamedTuple):
    x0: jax.Array
    lane0: jax.Array
    w_lo: jax.Array
    w_hi: jax.Array

    @property
    def batch_shape(self):
        return self.x0.shape


def _sizes(tensor_size, dim) -> Tuple[int, ...]:
    if isinstance(tensor_size, int):
        return (tensor_size,) * dim
    assert len(tensor_size) == dim
    return tuple(tensor_size)


@partial(jax.jit, static_argnames=("tensor_size", "dim"))
def grid_mapping(keys, tensor_size, dim):
    """Normalized keys [..., dim] in [-1, 1] -> GridMapping.

    Same clamp + gradient-balanced rescale as ``grid_positions``
    (DifferentiablePositions, cloud_transform.py:72-121)."""
    sizes = _sizes(tensor_size, dim)
    assert keys.shape[-1] == dim
    sizes_f = jnp.asarray(sizes, dtype=keys.dtype)
    keys = jnp.clip(keys, -1.0 + _EPS, 1.0 - _EPS)
    keys_scaled = balance_op(keys + 1.0, (sizes_f - 1.0) * 0.5)
    return GridMapping(*vertex_decomposition(keys_scaled, sizes))


def lane_offsets(sizes):
    if len(sizes) == 2:
        return (0, 1, 0, 1)  # last two unused (zero weights)
    return (0, 1, sizes[2], sizes[2] + 1)


def flat_vertex_indices(mapping: GridMapping, sizes):
    """All 8 (2x4) vertex flat indices, [..., 8] int32, lo row first.

    Order: [lo+off0, lo+off1, lo+off2, lo+off3, hi+off0, ...] — matches
    concat(w_lo, w_hi)."""
    lane_extent = int(np.prod(sizes[1:]))
    offs = jnp.asarray(lane_offsets(sizes), jnp.int32)
    lo = (mapping.x0[..., None] * lane_extent
          + mapping.lane0[..., None] + offs)
    hi = lo + lane_extent
    return jnp.concatenate([lo, hi], axis=-1)


def vertex_weights(mapping: GridMapping):
    """[..., 8] weights matching ``flat_vertex_indices`` order."""
    return jnp.concatenate([mapping.w_lo, mapping.w_hi], axis=-1)
