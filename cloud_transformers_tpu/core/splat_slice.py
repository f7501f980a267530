"""Splat (differentiable rasterization) and Slice (de-rasterization).

TPU-native reimplementation of the reference Splat/Slice
(/root/reference/layers/cloud_transform.py:124-227), channel-last.

Semantics (match the reference exactly — SURVEY.md §2.1 N4):

* **Splat** is a scatter-**max** of weight-modulated point features into a
  zero-initialized flat grid.  The zero init clamps purely negative
  contributions to 0, and the gradient flows only to the winning (argmax)
  contribution of each occupied cell (torch_scatter semantics); exact ties
  route to a SINGLE winner — the lowest point index — matching
  torch_scatter's one-argmax routing (duplicated points, e.g. the KPConv
  repeat-padding, tie systematically).

* **Slice** gathers the grid values at each point's 2**dim enclosing cell
  vertices and takes the weight-weighted sum.

Implementation: XLA's TPU scatter serializes (~40 cycles/update), so both the
splat forward and the slice backward (a scatter-add) run on the scatter-free
sorted segment reduction in ops/segment.py; the remaining pieces are gathers,
which are fast.  Custom VJPs keep the reference gradient routing.

Layouts:
  weights   [B, P, H, S]   bi/trilinear vertex weights (S = 2**dim)
  flat_idx  [B, P, H, S]   int32 flat cell-vertex indices in [0, G)
  values    [B, P, H*F]    point features, head-major channel order
  grid      [B, H, G, F]   flat grids (callers reshape to [B, *spatial, H*F]
                           channel-last for convolutions).
"""

from functools import partial

import jax
import jax.numpy as jnp

from cloud_transformers_tpu.ops.segment import segment_reduce_dense


def _gather_rows(grid, idx):
    """grid [R, G, F], idx [R, K] -> [R, K, F] (fast path: gather)."""
    return jax.vmap(lambda g, i: jnp.take(g, i, axis=0, mode="clip"))(grid,
                                                                      idx)


# --- splat: segment-max forward, argmax-routed backward -------------------

@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _splat_core(pre, idx, grid_cells):
    """pre [R, K, F], idx [R, K] -> grid [R, G, F] via per-cell max with
    zero-init clamp."""
    return segment_reduce_dense(idx, pre, grid_cells, op="max")


def _splat_core_fwd(pre, idx, grid_cells):
    grid = segment_reduce_dense(idx, pre, grid_cells, op="max")
    return grid, (pre, idx, grid)


def _winner_only(win, idx, grid_cells):
    """Restrict a per-contribution win mask [R, K, F] to the single
    lowest-index winner per (cell, feature) — torch_scatter routes the
    max gradient to exactly one argmax contribution, and duplicated points
    (the KPConv repeat-padding case) tie systematically.  Winner index per
    cell via a segment-min (as max of the negated index; contribution
    indices < 2**24 are exact in f32)."""
    r, k, f = win.shape
    kidx = jnp.arange(k, dtype=jnp.float32)[None, :, None]
    kidx = jnp.broadcast_to(kidx, (r, k, f))
    # segment max of (K - kidx): the zero-clamp inside segment_reduce_dense
    # leaves cells without winners at 0, i.e. an out-of-range winner index K
    score = jnp.where(win, k - kidx, -jnp.inf)
    best = segment_reduce_dense(idx, score, grid_cells, op="max")
    return win & (k - kidx == _gather_rows(best, idx))


def _splat_core_bwd(grid_cells, res, g):
    pre, idx, grid = res
    winning_val = _gather_rows(grid, idx)  # [R, K, F]
    # gradient routes to the contribution that equals the cell max, and only
    # where the max beat the zero init (chamfer of torch_scatter backward);
    # exact ties break to the lowest contribution index (single winner)
    win = (pre == winning_val) & (winning_val > 0.0)
    win = _winner_only(win, idx, grid_cells)
    d_pre = jnp.where(win, _gather_rows(g, idx), 0.0)
    return d_pre, None


_splat_core.defvjp(_splat_core_fwd, _splat_core_bwd)


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

    # pre-splat: [B, P, H, S, F] -> rows per (b, h)
    pre = weights[..., None] * values[:, :, :, None, :]
    pre = pre.transpose(0, 2, 1, 3, 4).reshape(b * h, p * s, f)
    idx = flat_idx.transpose(0, 2, 1, 3).reshape(b * h, p * s)

    grid = _splat_core(pre, idx, grid_cells)
    return grid.reshape(b, h, grid_cells, f)


# --- slice: gather forward, segment-sum backward --------------------------

@jax.custom_vjp
def _slice_core(grid, idx):
    """grid [R, G, F], idx [R, K] -> gathered [R, K, F]."""
    return _gather_rows(grid, idx)


def _slice_core_fwd(grid, idx):
    return _gather_rows(grid, idx), (idx, grid.shape)


def _slice_core_bwd(res, g):
    idx, grid_shape = res
    # transpose of a row gather is a scatter-add of the cotangents -> the
    # sorted segment-sum (ops/segment.py), not XLA scatter
    d_grid = segment_reduce_dense(idx, g, grid_shape[1], op="sum")
    return d_grid, None


_slice_core.defvjp(_slice_core_fwd, _slice_core_bwd)


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
    g = grid.shape[2]
    f = grid.shape[-1]
    idx = flat_idx.transpose(0, 2, 1, 3).reshape(b * h, p * s)

    gathered = _slice_core(grid.reshape(b * h, g, f), idx)  # [R, P*S, F]
    gathered = gathered.reshape(b, h, p, s, f).transpose(0, 2, 1, 3, 4)
    sliced = jnp.sum(gathered * weights[..., None], axis=3)  # [B, P, H, F]
    sliced = sliced.reshape(b, p, h * f)
    if pts_mask is not None:
        sliced = sliced * pts_mask[:, :, None].astype(sliced.dtype)
    return sliced


def splat_conv_slice(weights, flat_idx, values, heads, grid_cells, conv_fn=None,
                pts_mask=None):
    """Fused splat -> (optional grid transform) -> slice convenience wrapper."""
    grid = splat_max(weights, flat_idx, values, heads, grid_cells, pts_mask)
    if conv_fn is not None:
        grid = conv_fn(grid)
    return slice_grid(weights, flat_idx, grid, heads, pts_mask)


# ===========================================================================
# Mapping-based ops: Pallas kernel on TPU, sorted segment reduce elsewhere
# ===========================================================================

import numpy as _np

# bind the module, not core/__init__'s re-exported grid_mapping *function*
import cloud_transformers_tpu.core.grid_mapping as _gm
from cloud_transformers_tpu.ops.pallas_splat import pallas_splat as _pallas_splat

# set to True to force the portable path even on TPU (testing/ablation)
FORCE_XLA_PATH = False
# portable-path implementation: 'interpret' runs the Pallas kernel in
# interpreter mode (tiny compile, serial execution — right for the virtual
# CPU mesh); 'sorted' uses the sorted segment reduction (vectorized, but its
# sort graphs compile slowly and G-dominated sorts run slowly on CPU)
PORTABLE_IMPL = "interpret"


def _scatter_portable(x0, lane0, w_lo, w_hi, values, sizes, op):
    """Portable vertex scatter: expand the 8 vertices into the K axis and
    segment-reduce (ops/segment.py)."""
    mapping = _gm.GridMapping(x0, lane0, w_lo, w_hi)
    idx = _gm.flat_vertex_indices(mapping, sizes)        # [R, K, 8]
    w = _gm.vertex_weights(mapping)                      # [R, K, 8]
    pre = w[..., None] * values[:, :, None, :]           # [R, K, 8, F]
    r, k, s, f = pre.shape
    g = int(_np.prod(sizes))
    idx_flat = idx.transpose(0, 2, 1).reshape(r, s * k)
    pre_flat = pre.transpose(0, 2, 1, 3).reshape(r, s * k, f)
    from cloud_transformers_tpu.ops.segment import segment_reduce_dense
    return segment_reduce_dense(idx_flat, pre_flat, g, op=op)


def _scatter_generic(x0, lane0, w_lo, w_hi, values, sizes, op):
    """Vertex scatter (max or add), lowered per platform: the Pallas kernel
    on TPU, the sorted segment reduction elsewhere.

    values [R, K, F] -> grid [R, G, F]."""
    if PORTABLE_IMPL == "interpret":
        def portable(*a):
            return _pallas_splat(*a, sizes, values.shape[-1], op=op,
                                 interpret=True)
    else:
        def portable(*a):
            return _scatter_portable(*a, sizes, op)
    if FORCE_XLA_PATH:
        return portable(x0, lane0, w_lo, w_hi, values)
    return jax.lax.platform_dependent(
        x0, lane0, w_lo, w_hi, values,
        tpu=lambda *a: _pallas_splat(*a, sizes, values.shape[-1], op=op),
        default=portable,
    )


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _splat_m(sizes, x0, lane0, w_lo, w_hi, values):
    return _scatter_generic(x0, lane0, w_lo, w_hi, values, sizes, "max")


def _splat_m_fwd(sizes, x0, lane0, w_lo, w_hi, values):
    grid = _scatter_generic(x0, lane0, w_lo, w_hi, values, sizes, "max")
    return grid, (x0, lane0, w_lo, w_hi, values, grid)


def _splat_m_bwd_portable(sizes, x0, lane0, w_lo, w_hi, values, grid, g):
    mapping = _gm.GridMapping(x0, lane0, w_lo, w_hi)
    idx = _gm.flat_vertex_indices(mapping, sizes)      # [R, K, 8]
    w = _gm.vertex_weights(mapping)                    # [R, K, 8]
    r, k, s = idx.shape
    idx2 = idx.reshape(r, k * s)
    gmax = _gather_rows(grid, idx2).reshape(r, k, s, -1)   # [R, K, 8, F]
    gg = _gather_rows(g, idx2).reshape(r, k, s, -1)
    contrib = w[..., None] * values[:, :, None, :]
    win = (contrib == gmax) & (gmax > 0.0)
    # single lowest-point-index winner per (cell, feature): a point's 8
    # vertices land in 8 distinct cells, so flattening (K, S) point-major
    # makes "lowest contribution index" == "lowest point index"
    f = contrib.shape[-1]
    win = _winner_only(win.reshape(r, k * s, f), idx2,
                       int(_np.prod(sizes))).reshape(r, k, s, f)
    d_contrib = jnp.where(win, gg, 0.0)                # [R, K, 8, F]
    d_w = jnp.sum(d_contrib * values[:, :, None, :], axis=-1)  # [R, K, 8]
    d_values = jnp.sum(d_contrib * w[..., None], axis=2)       # [R, K, F]
    return d_w[..., :4], d_w[..., 4:], d_values


def _splat_m_bwd(sizes, res, g):
    from cloud_transformers_tpu.ops.pallas_splat import pallas_splat_bwd
    x0, lane0, w_lo, w_hi, values, grid = res
    feat = values.shape[-1]
    if FORCE_XLA_PATH:
        out = _splat_m_bwd_portable(sizes, x0, lane0, w_lo, w_hi, values,
                                    grid, g)
    else:
        out = jax.lax.platform_dependent(
            x0, lane0, w_lo, w_hi, values, grid, g,
            tpu=lambda *a: pallas_splat_bwd(*a, sizes, feat),
            default=lambda *a: _splat_m_bwd_portable(sizes, *a),
        )
    d_wlo, d_whi, d_values = out
    return (None, None, d_wlo, d_whi, d_values)


_splat_m.defvjp(_splat_m_fwd, _splat_m_bwd)


def _slice_portable(sizes, x0, lane0, w_lo, w_hi, grid):
    mapping = _gm.GridMapping(x0, lane0, w_lo, w_hi)
    idx = _gm.flat_vertex_indices(mapping, sizes)
    w = _gm.vertex_weights(mapping)
    r, k, s = idx.shape
    gathered = _gather_rows(grid, idx.reshape(r, k * s)).reshape(r, k, s, -1)
    return jnp.sum(gathered * w[..., None], axis=2)     # [R, K, F]


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _slice_m(sizes, x0, lane0, w_lo, w_hi, grid):
    from cloud_transformers_tpu.ops.pallas_splat import pallas_slice
    feat = grid.shape[-1]
    if PORTABLE_IMPL == "interpret":
        def portable(*a):
            return pallas_slice(*a, sizes, feat, interpret=True)
    else:
        def portable(*a):
            return _slice_portable(sizes, *a)
    if FORCE_XLA_PATH:
        return portable(x0, lane0, w_lo, w_hi, grid)
    return jax.lax.platform_dependent(
        x0, lane0, w_lo, w_hi, grid,
        tpu=lambda *a: pallas_slice(*a, sizes, feat),
        default=portable,
    )


def _slice_m_fwd(sizes, x0, lane0, w_lo, w_hi, grid):
    out = _slice_m(sizes, x0, lane0, w_lo, w_hi, grid)
    return out, (x0, lane0, w_lo, w_hi, grid)


def _slice_dw_portable(sizes, x0, lane0, w_lo, w_hi, grid, g):
    mapping = _gm.GridMapping(x0, lane0, w_lo, w_hi)
    idx = _gm.flat_vertex_indices(mapping, sizes)
    r, k, s = idx.shape
    gathered = _gather_rows(grid, idx.reshape(r, k * s)).reshape(r, k, s, -1)
    d_w = jnp.sum(gathered * g[:, :, None, :], axis=-1)  # [R, K, 8]
    return d_w[..., :4], d_w[..., 4:]


def _slice_m_bwd(sizes, res, g):
    from cloud_transformers_tpu.ops.pallas_splat import pallas_slice_bwd
    x0, lane0, w_lo, w_hi, grid = res
    feat = grid.shape[-1]
    if FORCE_XLA_PATH:
        # portable pair: scatter-add of cotangents + row-gather d_w
        d_grid = _scatter_generic(x0, lane0, w_lo, w_hi, g, sizes, "add")
        d_wlo, d_whi = _slice_dw_portable(sizes, x0, lane0, w_lo, w_hi,
                                          grid, g)
        return (None, None, d_wlo, d_whi, d_grid)

    if PORTABLE_IMPL == "interpret":
        def portable(*a):
            return pallas_slice_bwd(*a, sizes, feat, interpret=True)
    else:
        def portable(x0, lane0, w_lo, w_hi, g, grid):
            d_grid = _scatter_generic(x0, lane0, w_lo, w_hi, g, sizes,
                                      "add")
            d_wlo, d_whi = _slice_dw_portable(sizes, x0, lane0, w_lo, w_hi,
                                              grid, g)
            return d_grid, d_wlo, d_whi

    # one fused pass computes the cotangent scatter-add AND the per-vertex
    # d_w dots (two kernels re-reading the same points/grid before)
    d_grid, d_wlo, d_whi = jax.lax.platform_dependent(
        x0, lane0, w_lo, w_hi, g, grid,
        tpu=lambda *a: pallas_slice_bwd(*a, sizes, feat),
        default=portable,
    )
    return (None, None, d_wlo, d_whi, d_grid)


_slice_m.defvjp(_slice_m_fwd, _slice_m_bwd)


# ---------------------------------------------------------------------------
# Kernel-layout variants: grids stay in the Pallas layout [R, X*F_pad, lanes]
# BETWEEN ops (splat -> grid conv -> slice), so the only layout conversions
# are one fused transpose into the conv's [B, *spatial, H*F] and one back —
# the [R, G, F] round trips around every kernel (and around both backward
# kernels) measured 24% of the classifier forward.
# ---------------------------------------------------------------------------

from cloud_transformers_tpu.ops.pallas_splat import (
    flat_to_kernel as _flat_to_kernel,
    kernel_grid_dims as _kernel_grid_dims,
    kernel_to_flat as _kernel_to_flat,
)


def _scatter_generic_k(x0, lane0, w_lo, w_hi, values, sizes, op):
    """Vertex scatter returning the KERNEL-layout grid."""
    feat = values.shape[-1]
    if PORTABLE_IMPL == "interpret":
        def portable(*a):
            return _pallas_splat(*a, sizes, feat, op=op, interpret=True,
                                 kernel_layout_out=True)
    else:
        def portable(*a):
            return _flat_to_kernel(_scatter_portable(*a, sizes, op), sizes,
                                   feat)
    if FORCE_XLA_PATH:
        return portable(x0, lane0, w_lo, w_hi, values)
    return jax.lax.platform_dependent(
        x0, lane0, w_lo, w_hi, values,
        tpu=lambda *a: _pallas_splat(*a, sizes, feat, op=op,
                                     kernel_layout_out=True),
        default=portable,
    )


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _splat_mk(sizes, x0, lane0, w_lo, w_hi, values):
    return _scatter_generic_k(x0, lane0, w_lo, w_hi, values, sizes, "max")


# EXPERIMENT (measured, default OFF): track the argmax winner map IN the
# forward scatter when it runs under AD (custom_vjp fwd only — the
# primal/eval path never pays), collapsing the backward to the single
# read-only routing pass (pallas_splat_bwd_routed).  Measured on v5e
# (R=128 K=2048 F=8): the winner RMW costs only +1.7/+0.9 c/pt (32^3 /
# 128^2) in the fwd, but the two-phase backward's scatter-min pass it
# eliminates is just as small — routing alone is 42.4/38.4 c/pt of the
# 52.5/43.9 two-phase total, i.e. the reduce work (sublane/lane reduces +
# per-vertex dw dots), not the winner recomputation, is the backward's
# real cost.  Classifier train step same-process A/B: 830.9 (on) vs 832.4
# (off) ms — a wash — while compile time grew 85 -> 292 s.  Default OFF;
# kernel + wiring + bit-exactness tests stay as the recorded rejection
# (tests/test_splat_slice.py::test_fwd_winner_matches_two_phase_*).
FWD_WINNER = False


def _scatter_max_k_winner(x0, lane0, w_lo, w_hi, values, sizes):
    """(grid_k, winner_k) for the AD forward — see FWD_WINNER above."""
    feat = values.shape[-1]
    if PORTABLE_IMPL == "interpret":
        def portable(*a):
            return _pallas_splat(*a, sizes, feat, op="max", interpret=True,
                                 kernel_layout_out=True, with_winner=True)
    else:
        def portable(x0, lane0, w_lo, w_hi, values):
            gk = _flat_to_kernel(
                _scatter_portable(x0, lane0, w_lo, w_hi, values, sizes,
                                  "max"), sizes, feat)
            # placeholder aval-match only: the portable backward recomputes
            # the winner matching itself and never reads this residual
            return gk, jnp.zeros_like(gk)
    if FORCE_XLA_PATH:
        return portable(x0, lane0, w_lo, w_hi, values)
    return jax.lax.platform_dependent(
        x0, lane0, w_lo, w_hi, values,
        tpu=lambda *a: _pallas_splat(*a, sizes, feat, op="max",
                                     kernel_layout_out=True,
                                     with_winner=True),
        default=portable,
    )


def _splat_mk_fwd(sizes, x0, lane0, w_lo, w_hi, values):
    if FWD_WINNER:
        gk, wk = _scatter_max_k_winner(x0, lane0, w_lo, w_hi, values, sizes)
    else:
        gk = _scatter_generic_k(x0, lane0, w_lo, w_hi, values, sizes, "max")
        wk = None
    return gk, (x0, lane0, w_lo, w_hi, values, gk, wk)


def _splat_mk_bwd(sizes, res, g):
    from cloud_transformers_tpu.ops.pallas_splat import (
        pallas_splat_bwd, pallas_splat_bwd_routed)
    x0, lane0, w_lo, w_hi, values, gk, wk = res
    feat = values.shape[-1]

    def portable(x0, lane0, w_lo, w_hi, values, gk, g):
        return _splat_m_bwd_portable(
            sizes, x0, lane0, w_lo, w_hi, values,
            _kernel_to_flat(gk, sizes, feat),
            _kernel_to_flat(g, sizes, feat))

    if wk is not None:
        # forward-tracked winner map: single routing pass; the portable
        # branch keeps recomputing the match from the grid (its wk is a
        # placeholder — see _scatter_max_k_winner)
        if PORTABLE_IMPL == "interpret":
            def portable_w(x0, lane0, w_lo, w_hi, values, wk, g):
                return pallas_splat_bwd_routed(x0, lane0, w_lo, w_hi,
                                               values, wk, g, sizes, feat,
                                               interpret=True)
        else:
            def portable_w(x0, lane0, w_lo, w_hi, values, wk, g):
                return portable(x0, lane0, w_lo, w_hi, values, gk, g)
        if FORCE_XLA_PATH:
            out = portable_w(x0, lane0, w_lo, w_hi, values, wk, g)
        else:
            out = jax.lax.platform_dependent(
                x0, lane0, w_lo, w_hi, values, wk, g,
                tpu=lambda *a: pallas_splat_bwd_routed(*a, sizes, feat),
                default=portable_w,
            )
        d_wlo, d_whi, d_values = out
        return (None, None, d_wlo, d_whi, d_values)

    if PORTABLE_IMPL == "interpret":
        def portable(*a):
            return pallas_splat_bwd(*a, sizes, feat, interpret=True,
                                    kernel_layout_in=True)
    if FORCE_XLA_PATH:
        out = portable(x0, lane0, w_lo, w_hi, values, gk, g)
    else:
        out = jax.lax.platform_dependent(
            x0, lane0, w_lo, w_hi, values, gk, g,
            tpu=lambda *a: pallas_splat_bwd(*a, sizes, feat,
                                            kernel_layout_in=True),
            default=portable,
        )
    d_wlo, d_whi, d_values = out
    return (None, None, d_wlo, d_whi, d_values)


_splat_mk.defvjp(_splat_mk_fwd, _splat_mk_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _slice_mk(sizes, feat, x0, lane0, w_lo, w_hi, gk):
    from cloud_transformers_tpu.ops.pallas_splat import pallas_slice
    if PORTABLE_IMPL == "interpret":
        def portable(*a):
            return pallas_slice(*a, sizes, feat, interpret=True,
                                kernel_layout_in=True)
    else:
        def portable(x0, lane0, w_lo, w_hi, gk):
            return _slice_portable(sizes, x0, lane0, w_lo, w_hi,
                                   _kernel_to_flat(gk, sizes, feat))
    if FORCE_XLA_PATH:
        return portable(x0, lane0, w_lo, w_hi, gk)
    return jax.lax.platform_dependent(
        x0, lane0, w_lo, w_hi, gk,
        tpu=lambda *a: pallas_slice(*a, sizes, feat, kernel_layout_in=True),
        default=portable,
    )


def _slice_mk_fwd(sizes, feat, x0, lane0, w_lo, w_hi, gk):
    out = _slice_mk(sizes, feat, x0, lane0, w_lo, w_hi, gk)
    return out, (x0, lane0, w_lo, w_hi, gk)


def _slice_mk_bwd(sizes, feat, res, g):
    from cloud_transformers_tpu.ops.pallas_splat import pallas_slice_bwd
    x0, lane0, w_lo, w_hi, gk = res

    def portable(x0, lane0, w_lo, w_hi, g, gk):
        grid = _kernel_to_flat(gk, sizes, feat)
        d_grid = _scatter_generic(x0, lane0, w_lo, w_hi, g, sizes, "add")
        d_wlo, d_whi = _slice_dw_portable(sizes, x0, lane0, w_lo, w_hi,
                                          grid, g)
        return _flat_to_kernel(d_grid, sizes, feat), d_wlo, d_whi

    if PORTABLE_IMPL == "interpret":
        def portable(*a):
            return pallas_slice_bwd(*a, sizes, feat, interpret=True,
                                    kernel_layout=True)
    if FORCE_XLA_PATH:
        d_gk, d_wlo, d_whi = portable(x0, lane0, w_lo, w_hi, g, gk)
    else:
        d_gk, d_wlo, d_whi = jax.lax.platform_dependent(
            x0, lane0, w_lo, w_hi, g, gk,
            tpu=lambda *a: pallas_slice_bwd(*a, sizes, feat,
                                            kernel_layout=True),
            default=portable,
        )
    return (None, None, d_wlo, d_whi, d_gk)


_slice_mk.defvjp(_slice_mk_fwd, _slice_mk_bwd)


@partial(jax.jit, static_argnames=("sizes",))
def splat_max_mapping_k(mapping, values, sizes, pts_mask=None):
    """Mapping-based splat returning the KERNEL-layout grid
    [B*H, X*F_pad, lanes] (zero padding).  Pair with
    ``slice_grid_mapping_k`` / ``gridk_to_spatial``."""
    b, p, h = mapping.x0.shape
    f = values.shape[-1] // h
    v = values.reshape(b, p, h, f)
    if pts_mask is not None:
        v = v * pts_mask[:, :, None, None].astype(v.dtype)
    v = v.transpose(0, 2, 1, 3).reshape(b * h, p, f)
    x0, lane0, w_lo, w_hi = _flatten_mapping(mapping)
    return _splat_mk(tuple(sizes), x0, lane0, w_lo, w_hi, v)


@partial(jax.jit, static_argnames=("sizes", "feat"))
def slice_grid_mapping_k(mapping, gk, sizes, feat, pts_mask=None):
    """Mapping-based slice from a KERNEL-layout grid -> [B, P, H*F]."""
    b, p, h = mapping.x0.shape
    x0, lane0, w_lo, w_hi = _flatten_mapping(mapping)
    out = _slice_mk(tuple(sizes), feat, x0, lane0, w_lo, w_hi, gk)  # [R,P,F]
    out = out.reshape(b, h, p, feat).transpose(0, 2, 1, 3).reshape(
        b, p, h * feat)
    if pts_mask is not None:
        out = out * pts_mask[:, :, None].astype(out.dtype)
    return out


@partial(jax.jit, static_argnames=("batch", "sizes", "feat"))
def gridk_to_spatial(gk, batch, sizes, feat):
    """Kernel layout [B*H, X*F_pad, lanes] -> conv input
    [B, *sizes, H*F] (channel order c = h*F + f, grouped-conv groups=H) in
    ONE fused slice+transpose."""
    h = gk.shape[0] // batch
    x_dim, lane_extent, lanes, f_pad = _kernel_grid_dims(sizes, feat)
    g = gk.reshape(batch, h, x_dim, f_pad, lanes)[
        :, :, :, :feat, :lane_extent]
    g = g.transpose(0, 2, 4, 1, 3)          # [B, X, lanes, H, F]
    return g.reshape((batch,) + tuple(sizes) + (h * feat,))


@partial(jax.jit, static_argnames=("heads", "sizes", "feat"))
def spatial_to_gridk(gs, heads, sizes, feat):
    """Inverse of ``gridk_to_spatial``: [B, *sizes, H*F] -> kernel layout
    [B*H, X*F_pad, lanes] (zero padding)."""
    b = gs.shape[0]
    x_dim, lane_extent, lanes, f_pad = _kernel_grid_dims(sizes, feat)
    g = gs.reshape(b, x_dim, lane_extent, heads, feat)
    g = g.transpose(0, 3, 1, 4, 2)          # [B, H, X, F, lanes]
    g = jnp.pad(g, ((0, 0), (0, 0), (0, 0), (0, f_pad - feat),
                    (0, lanes - lane_extent)))
    return g.reshape(b * heads, x_dim * f_pad, lanes)


def _flatten_mapping(mapping):
    """[B, P, H(, 4)] arrays -> per-(b*h) rows [R, P(, 4)]."""
    b, p, h = mapping.x0.shape
    tr = lambda a: a.transpose(0, 2, 1).reshape(b * h, p)
    tr4 = lambda a: a.transpose(0, 2, 1, 3).reshape(b * h, p, 4)
    return (tr(mapping.x0), tr(mapping.lane0),
            tr4(mapping.w_lo), tr4(mapping.w_hi))


@partial(jax.jit, static_argnames=("sizes",))
def splat_max_mapping(mapping, values, sizes, pts_mask=None):
    """Mapping-based splat: values [B, P, H*F] -> grid [B, H, G, F].

    Same semantics as ``splat_max``; runs the fused Pallas kernel on TPU."""
    b, p, h = mapping.x0.shape
    f = values.shape[-1] // h
    v = values.reshape(b, p, h, f)
    if pts_mask is not None:
        v = v * pts_mask[:, :, None, None].astype(v.dtype)
    v = v.transpose(0, 2, 1, 3).reshape(b * h, p, f)
    x0, lane0, w_lo, w_hi = _flatten_mapping(mapping)
    grid = _splat_m(tuple(sizes), x0, lane0, w_lo, w_hi, v)
    return grid.reshape(b, h, -1, f)


@partial(jax.jit, static_argnames=("sizes",))
def slice_grid_mapping(mapping, grid, sizes, pts_mask=None):
    """Mapping-based slice: grid [B, H, G, F] -> [B, P, H*F]."""
    b, p, h = mapping.x0.shape
    g, f = grid.shape[2], grid.shape[3]
    x0, lane0, w_lo, w_hi = _flatten_mapping(mapping)
    out = _slice_m(tuple(sizes), x0, lane0, w_lo, w_hi,
                   grid.reshape(b * h, g, f))          # [R, P, F]
    out = out.reshape(b, h, p, f).transpose(0, 2, 1, 3).reshape(b, p, h * f)
    if pts_mask is not None:
        out = out * pts_mask[:, :, None].astype(out.dtype)
    return out


# ---------------------------------------------------------------------------
# Fused block: splat -> grouped conv -> slice in ONE Pallas kernel
# (ops/pallas_fused_block.py).  The forward keeps the grid resident in VMEM
# between the three phases; the backward composes the three existing
# backward kernels.  Replaces the whole MHCT hot loop of reference
# layers/multihead_ct.py:50-65 per block.
# ---------------------------------------------------------------------------


def _fused_composed(sizes, feat, heads, x0, lane0, w_lo, w_hi, values,
                    kernel, bias, want_gk2, interpret):
    """Portable composition of the three ops (CPU / correctness anchor)."""
    from cloud_transformers_tpu.ops.pallas_grid_conv import _grid_conv
    gk = _scatter_generic_k(x0, lane0, w_lo, w_hi, values, sizes, "max")
    gk2 = _grid_conv(sizes, feat, heads, gk, kernel, bias)
    pts = _slice_mk(sizes, feat, x0, lane0, w_lo, w_hi, gk2)
    if want_gk2:
        return pts, gk, gk2
    return pts, gk


def _fused_dispatch(sizes, feat, heads, x0, lane0, w_lo, w_hi, values,
                    kernel, bias, want_gk2):
    from cloud_transformers_tpu.ops.pallas_fused_block import (
        pallas_fused_block)
    if FORCE_XLA_PATH:
        return _fused_composed(sizes, feat, heads, x0, lane0, w_lo, w_hi,
                               values, kernel, bias, want_gk2, False)
    if PORTABLE_IMPL == "interpret":
        def portable(*a):
            return pallas_fused_block(*a, sizes, feat, heads,
                                      want_gk2=want_gk2, interpret=True)
    else:
        def portable(x0, lane0, w_lo, w_hi, values, kernel, bias):
            return _fused_composed(sizes, feat, heads, x0, lane0, w_lo,
                                   w_hi, values, kernel, bias, want_gk2,
                                   False)
    return jax.lax.platform_dependent(
        x0, lane0, w_lo, w_hi, values, kernel, bias,
        tpu=lambda *a: pallas_fused_block(*a, sizes, feat, heads,
                                          want_gk2=want_gk2),
        default=portable,
    )


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _fused_block_mk(sizes, feat, heads, x0, lane0, w_lo, w_hi, values,
                    kernel, bias):
    """-> (pts [R, K, F], gk kernel-layout).  gk feeds the occupancy stats
    (and, under differentiation, the splat backward's winner routing)."""
    return _fused_dispatch(sizes, feat, heads, x0, lane0, w_lo, w_hi,
                           values, kernel, bias, want_gk2=False)


def _fused_block_mk_fwd(sizes, feat, heads, x0, lane0, w_lo, w_hi, values,
                        kernel, bias):
    pts, gk, gk2 = _fused_dispatch(sizes, feat, heads, x0, lane0, w_lo,
                                   w_hi, values, kernel, bias,
                                   want_gk2=True)
    return (pts, gk), (x0, lane0, w_lo, w_hi, values, kernel, gk, gk2)


def _fused_block_mk_bwd(sizes, feat, heads, res, cots):
    from cloud_transformers_tpu.ops.pallas_grid_conv import _grid_conv_bwd
    from cloud_transformers_tpu.ops.pallas_splat import (
        pallas_slice_bwd, pallas_splat_bwd)
    x0, lane0, w_lo, w_hi, values, kernel, gk, gk2 = res
    d_pts, d_gk_out = cots   # gk feeds stop_gradient stats; handle anyway

    # slice backward: d_gk2 scatter-add + slice-side vertex-weight grads
    _, _, d_wlo_s, d_whi_s, d_gk2 = _slice_mk_bwd(
        sizes, feat, (x0, lane0, w_lo, w_hi, gk2), d_pts)
    # conv backward (transposed conv + dW contraction + bias reduce)
    d_gk_c, d_kernel, d_bias = _grid_conv_bwd(
        sizes, feat, heads, (gk, kernel), d_gk2)
    d_gk = d_gk_c + d_gk_out
    # splat backward: winner-routed through gk (wk=None: the fused block's
    # forward never tracks a winner map — FWD_WINNER is a splat_max-only
    # experiment)
    _, _, d_wlo_p, d_whi_p, d_values = _splat_mk_bwd(
        sizes, (x0, lane0, w_lo, w_hi, values, gk, None), d_gk)
    return (None, None, d_wlo_s + d_wlo_p, d_whi_s + d_whi_p, d_values,
            d_kernel, d_bias)


_fused_block_mk.defvjp(_fused_block_mk_fwd, _fused_block_mk_bwd)


@partial(jax.jit, static_argnames=("sizes", "feat", "heads"))
def fused_block_mk(mapping, values, kernel, bias, sizes, feat, heads,
                   pts_mask=None):
    """Mapping-based fused splat+conv+slice: values [B, P, H*F] ->
    (out [B, P, H*F], gk kernel-layout [B*H, X*F_pad, lanes]).

    Mask semantics match splat_max_mapping_k + slice_grid_mapping_k
    (reference cloud_transform.py:158-159): masked points contribute zeros
    to the splat and read back zeros from the slice."""
    b, p, h = mapping.x0.shape
    f = values.shape[-1] // h
    v = values.reshape(b, p, h, f)
    if pts_mask is not None:
        v = v * pts_mask[:, :, None, None].astype(v.dtype)
    v = v.transpose(0, 2, 1, 3).reshape(b * h, p, f)
    x0, lane0, w_lo, w_hi = _flatten_mapping(mapping)
    if bias is None:
        bias = jnp.zeros((h * f,), jnp.float32)
    pts, gk = _fused_block_mk(tuple(sizes), f, h, x0, lane0, w_lo, w_hi, v,
                              kernel, bias)
    out = pts.reshape(b, h, p, f).transpose(0, 2, 1, 3).reshape(b, p, h * f)
    if pts_mask is not None:
        out = out * pts_mask[:, :, None].astype(out.dtype)
    return out, gk
