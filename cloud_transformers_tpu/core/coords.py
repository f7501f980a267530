"""Bi/trilinear cell-vertex weights and indices for differentiable rasterization.

TPU-native reimplementation of the grid positioning math of the reference
(/root/reference/layers/utils.py:100-186 and layers/cloud_transform.py:62-121),
in channel-last layout: keys are ``[..., dim]`` instead of ``[B, H*dim, P]``.

Given continuous grid-space coordinates ``u`` in ``[0, size_d - 1]`` per spatial
dimension, each point is expressed as a convex combination of the 2**dim
vertices of its enclosing cell:

    weights[s]  -- product of (1 - frac) / frac per axis           (sum to 1)
    index[s]    -- flat row-major index of vertex s in the grid

The vertex ("spread") ordering matches the reference exactly: 3D order is
(x,y,z) offsets [000, 100, 010, 110, 001, 101, 011, 111]
(layers/utils.py:103-110); 2D order is [00, 10, 01, 11] (utils.py:161-164).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from cloud_transformers_tpu.core.balance import balance_op

# Vertex offset tables, identical ordering to the reference spread tables.
_SPREAD_3D = np.array(
    [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
     [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1]], dtype=np.int32)
_SPREAD_2D = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], dtype=np.int32)

_EPS = 1e-7


def _linear_coords(keys, spread):
    """Shared bi/trilinear machinery.

    Args:
      keys: ``[..., dim]`` float coordinates in grid units (``[0, size-1]``).
      spread: ``[S, dim]`` vertex offset table.

    Returns:
      weights ``[..., S]`` and integer vertex coords ``[..., S, dim]``.
    """
    floored = jnp.floor(keys)
    frac = keys - floored  # in [0, 1)
    # weight for vertex with offset o along axis d: frac if o==1 else (1-frac)
    # [..., 1, dim] against [S, dim] broadcast -> [..., S, dim]
    o = jnp.asarray(spread, dtype=keys.dtype)
    w = jnp.where(o > 0.5, frac[..., None, :], 1.0 - frac[..., None, :])
    weights = jnp.prod(w, axis=-1)
    idx = floored[..., None, :].astype(jnp.int32) + jnp.asarray(spread)
    return weights, idx


def trilinear_coords(keys):
    """``keys [..., 3]`` -> (weights ``[..., 8]``, vertex coords ``[..., 8, 3]``).

    Matches /root/reference/layers/utils.py:100-155 (same vertex order; the
    reference computes the weights as products of opposite-corner distances,
    which is algebraically the per-axis frac/(1-frac) product used here).
    """
    return _linear_coords(keys, _SPREAD_3D)


def bilinear_coords(keys):
    """``keys [..., 2]`` -> (weights ``[..., 4]``, vertex coords ``[..., 4, 2]``).

    Matches /root/reference/layers/utils.py:158-186.
    """
    return _linear_coords(keys, _SPREAD_2D)


@partial(jax.jit, static_argnames=("tensor_size", "dim"))
def grid_positions(keys, tensor_size, dim):
    """Normalized keys -> (cell-vertex weights, flat vertex indices).

    TPU-native equivalent of ``DifferentiablePositions.forward``
    (/root/reference/layers/cloud_transform.py:72-121):

      1. clamp keys to ``[-1+eps, 1-eps]``
      2. affine rescale to ``[0, size-1]`` with gradient balancing
         (forward ``(keys+1) * (size-1)/2``, backward identity)
      3. bi/trilinear weights + row-major flat vertex indices.

    Args:
      keys: ``[..., H, dim]`` float in [-1, 1] (any leading batch/point dims).
      tensor_size: int or tuple of ``dim`` ints — grid resolution.
      dim: 2 or 3.

    Returns:
      weights: ``[..., H, S]`` float, S = 2**dim.
      flat_idx: ``[..., H, S]`` int32 flat row-major cell-vertex indices.
    """
    if isinstance(tensor_size, int):
        sizes = (tensor_size,) * dim
    else:
        sizes = tuple(tensor_size)
        assert len(sizes) == dim
    assert keys.shape[-1] == dim

    sizes_f = jnp.asarray(sizes, dtype=keys.dtype)
    keys = jnp.clip(keys, -1.0 + _EPS, 1.0 - _EPS)
    keys_scaled = balance_op(keys + 1.0, (sizes_f - 1.0) * 0.5)

    if dim == 3:
        weights, vert = trilinear_coords(keys_scaled)
        flat_idx = (vert[..., 0] * (sizes[1] * sizes[2])
                    + vert[..., 1] * sizes[2] + vert[..., 2])
    else:
        weights, vert = bilinear_coords(keys_scaled)
        flat_idx = vert[..., 0] * sizes[1] + vert[..., 1]

    return weights, flat_idx
