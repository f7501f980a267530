"""Kernel-layout grid currency: the _k mapping API must be numerically
identical (forward AND gradients) to the flat [B, H, G, F] API — it only
changes WHERE the layout conversions happen (core/splat_slice.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cloud_transformers_tpu.core import (
    grid_mapping,
    splat_max_mapping,
    slice_grid_mapping,
    splat_max_mapping_k,
    slice_grid_mapping_k,
    gridk_to_spatial,
    spatial_to_gridk,
)
from cloud_transformers_tpu.nn.multihead import grid_to_spatial


CASES = [
    ((8, 8, 8), 4, 3),     # 3D, feat < f_pad (padded rows)
    ((16, 16, 16), 16, 2), # 3D, feat == f_pad
    ((32, 32), 8, 2),      # 2D, padded lanes (32 < 128)
]


def _inputs(sizes, feat, heads, b=2, p=64, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    keys = jnp.tanh(jax.random.normal(k1, (b, p, heads, len(sizes))))
    values = jax.random.normal(k2, (b, p, heads * feat))
    m = grid_mapping(keys, sizes, len(sizes))
    return m, keys, values


@pytest.mark.parametrize("sizes,feat,heads", CASES)
def test_splat_k_matches_flat(sizes, feat, heads):
    m, _, values = _inputs(sizes, feat, heads)
    ref = splat_max_mapping(m, values, sizes)          # [B, H, G, F]
    gk = splat_max_mapping_k(m, values, sizes)
    b = ref.shape[0]
    got = gridk_to_spatial(gk, b, sizes, feat)
    want = grid_to_spatial(ref, sizes)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=0)


@pytest.mark.parametrize("sizes,feat,heads", CASES)
def test_slice_k_matches_flat(sizes, feat, heads):
    m, _, values = _inputs(sizes, feat, heads)
    grid = splat_max_mapping(m, values, sizes)
    gk = splat_max_mapping_k(m, values, sizes)
    ref = slice_grid_mapping(m, grid, sizes)
    got = slice_grid_mapping_k(m, gk, sizes, feat)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_spatial_gridk_round_trip():
    sizes, feat, heads = (8, 8, 8), 4, 3
    m, _, values = _inputs(sizes, feat, heads)
    gk = splat_max_mapping_k(m, values, sizes)
    gs = gridk_to_spatial(gk, 2, sizes, feat)
    back = spatial_to_gridk(gs, heads, sizes, feat)
    np.testing.assert_allclose(np.asarray(back), np.asarray(gk))


@pytest.mark.parametrize("sizes,feat,heads", CASES[:2])
def test_grads_match_flat_path(sizes, feat, heads):
    """Full splat -> (elementwise grid op) -> slice chain: d_keys and
    d_values must match the flat-layout path exactly (same argmax
    routing)."""
    m0, keys, values = _inputs(sizes, feat, heads)
    dim = len(sizes)

    def loss_flat(keys, values):
        m = grid_mapping(keys, sizes, dim)
        grid = splat_max_mapping(m, values, sizes)
        gs = grid_to_spatial(grid, sizes)
        gs = gs * 1.7 + gs ** 2
        b = keys.shape[0]
        from cloud_transformers_tpu.nn.multihead import spatial_to_grid
        out = slice_grid_mapping(m, spatial_to_grid(gs, heads), sizes)
        return jnp.sum(jnp.sin(out))

    def loss_k(keys, values):
        m = grid_mapping(keys, sizes, dim)
        gk = splat_max_mapping_k(m, values, sizes)
        b = keys.shape[0]
        gs = gridk_to_spatial(gk, b, sizes, feat)
        gs = gs * 1.7 + gs ** 2
        gk2 = spatial_to_gridk(gs, heads, sizes, feat)
        out = slice_grid_mapping_k(m, gk2, sizes, feat)
        return jnp.sum(jnp.sin(out))

    g_ref = jax.grad(loss_flat, argnums=(0, 1))(keys, values)
    g_k = jax.grad(loss_k, argnums=(0, 1))(keys, values)
    for a, b_ in zip(g_ref, g_k):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)


def test_pts_mask_k():
    sizes, feat, heads = (8, 8, 8), 4, 2
    m, _, values = _inputs(sizes, feat, heads)
    mask = jnp.array([[1.0] * 32 + [0.0] * 32] * 2)
    ref_grid = splat_max_mapping(m, values, sizes, pts_mask=mask)
    gk = splat_max_mapping_k(m, values, sizes, pts_mask=mask)
    got = gridk_to_spatial(gk, 2, sizes, feat)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(grid_to_spatial(ref_grid, sizes)))
    out_ref = slice_grid_mapping(m, ref_grid, sizes, pts_mask=mask)
    out_k = slice_grid_mapping_k(m, gk, sizes, feat, pts_mask=mask)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_ref),
                               rtol=1e-6, atol=1e-6)
