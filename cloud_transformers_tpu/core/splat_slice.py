"""Splat (differentiable rasterization) and Slice (de-rasterization).

TPU-native reimplementation of the reference Splat/Slice
(/root/reference/layers/cloud_transform.py:124-227), channel-last.

Semantics (must match the reference exactly — SURVEY.md §2.1 N4):

* **Splat** is a scatter-**max** of weight-modulated point features into a
  zero-initialized flat grid.  Because the grid starts at zero, purely negative
  contributions are clamped to 0, and the gradient flows only to the winning
  (argmax) contribution of each occupied cell (torch_scatter semantics).  JAX's
  ``.at[].max`` scatter has exactly this VJP: the zero init is a constant (no
  grad), and the cotangent routes to the selected update.

* **Slice** gathers the grid values at each point's 2**dim enclosing cell
  vertices and takes the weight-weighted sum.

Layouts:
  weights   [B, P, H, S]   bi/trilinear vertex weights (S = 2**dim)
  flat_idx  [B, P, H, S]   int32 flat cell-vertex indices in [0, G)
  values    [B, P, H*F]    point features, head-major channel order
  grid      [B, H*F, G]    flat grid (head-major channels); callers reshape to
                           [B, *spatial, H*F] (channel-last) for convolutions.
"""

from functools import partial

import jax
import jax.numpy as jnp


def _scatter_max_one(idx, src, grid_cells):
    """idx [K], src [K, F] -> [G, F] scatter-max into zeros."""
    return jnp.zeros((grid_cells, src.shape[-1]), src.dtype).at[idx].max(
        src, mode="drop", unique_indices=False
    )


@partial(jax.jit, static_argnames=("heads", "grid_cells"))
def splat_max(weights, flat_idx, values, heads, grid_cells, pts_mask=None):
    """Rasterize point features into per-head flat grids via scatter-max.

    Args:
      weights: [B, P, H, S] vertex weights.
      flat_idx: [B, P, H, S] int32 flat cell indices.
      values: [B, P, H*F] features (head-major: channel c = h*F + f).
      heads: H.
      grid_cells: G = prod(tensor_size).
      pts_mask: optional [B, P] float/bool; 0 masks padded points
        (reference: cloud_transform.py:158-159).

    Returns:
      grid: [B, H, G, F] float.
    """
    b, p, h, s = weights.shape
    f = values.shape[-1] // heads
    assert h == heads
    values = values.reshape(b, p, h, f)
    if pts_mask is not None:
        values = values * pts_mask[:, :, None, None].astype(values.dtype)

    # pre-splat: [B, P, H, S, F]
    pre = weights[..., None] * values[:, :, :, None, :]
    # -> [B, H, P*S, F] and [B, H, P*S]
    pre = pre.transpose(0, 2, 1, 3, 4).reshape(b, h, p * s, f)
    idx = flat_idx.transpose(0, 2, 1, 3).reshape(b, h, p * s)

    scat = jax.vmap(jax.vmap(_scatter_max_one, in_axes=(0, 0, None)),
                    in_axes=(0, 0, None))
    return scat(idx, pre, grid_cells)  # [B, H, G, F]


@partial(jax.jit, static_argnames=("heads",))
def slice_grid(weights, flat_idx, grid, heads, pts_mask=None):
    """De-rasterize: gather grid at cell vertices, weighted-sum over vertices.

    Args:
      weights: [B, P, H, S].
      flat_idx: [B, P, H, S] int32.
      grid: [B, H, G, F] (output of splat_max / convolution, flattened).
      heads: H.
      pts_mask: optional [B, P] — zeros the output rows of padded points
        (reference: cloud_transform.py:224-225).

    Returns:
      sliced: [B, P, H*F].
    """
    b, p, h, s = weights.shape
    f = grid.shape[-1]
    idx = flat_idx.transpose(0, 2, 1, 3).reshape(b, h, p * s)

    def _gather_one(g, i):  # g [G, F], i [K]
        return jnp.take(g, i, axis=0, mode="clip")

    gathered = jax.vmap(jax.vmap(_gather_one))(grid, idx)  # [B, H, P*S, F]
    gathered = gathered.reshape(b, h, p, s, f).transpose(0, 2, 1, 3, 4)
    sliced = jnp.sum(gathered * weights[..., None], axis=3)  # [B, P, H, F]
    sliced = sliced.reshape(b, p, h * f)
    if pts_mask is not None:
        sliced = sliced * pts_mask[:, :, None].astype(sliced.dtype)
    return sliced


def splat_slice(weights, flat_idx, values, heads, grid_cells, conv_fn=None,
                pts_mask=None):
    """Fused splat -> (optional grid transform) -> slice convenience wrapper."""
    grid = splat_max(weights, flat_idx, values, heads, grid_cells, pts_mask)
    if conv_fn is not None:
        grid = conv_fn(grid)
    return slice_grid(weights, flat_idx, grid, heads, pts_mask)
