"""Point-axis-sharded splat/slice (parallel/point_sharded.py): the Pallas
kernel path runs per-device inside shard_map on the virtual 8-CPU mesh and
must match the single-device result exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cloud_transformers_tpu.core import grid_mapping
from cloud_transformers_tpu.core.splat_slice import (
    slice_grid_mapping,
    splat_max_mapping,
)
from cloud_transformers_tpu.parallel.mesh import make_mesh, shard_batch
from cloud_transformers_tpu.parallel.point_sharded import (
    slice_grid_point_sharded,
    splat_max_point_sharded,
)

B, P_, H, F = 2, 64, 2, 8
SIZES = (8, 8, 8)


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    keys = np.tanh(rng.randn(B, P_, H, 3)).astype(np.float32)
    values = rng.randn(B, P_, H * F).astype(np.float32)
    mask = (rng.rand(B, P_) > 0.2).astype(np.float32)
    return jnp.asarray(keys), jnp.asarray(values), jnp.asarray(mask)


def test_splat_point_sharded_matches_single(data):
    keys, values, mask = data
    mesh = make_mesh(n_data=2, n_points=4)
    m = grid_mapping(keys, SIZES, 3)
    ref = splat_max_mapping(m, values, SIZES, pts_mask=mask)

    fn = jax.jit(lambda m_, v_, msk: splat_max_point_sharded(
        mesh, m_, v_, SIZES, pts_mask=msk))
    with mesh:
        out = fn(m, values, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_slice_point_sharded_matches_single(data):
    keys, values, mask = data
    mesh = make_mesh(n_data=2, n_points=4)
    m = grid_mapping(keys, SIZES, 3)
    grid = splat_max_mapping(m, values, SIZES)
    ref = slice_grid_mapping(m, grid, SIZES, pts_mask=mask)

    fn = jax.jit(lambda m_, g_, msk: slice_grid_point_sharded(
        mesh, m_, g_, SIZES, pts_mask=msk))
    with mesh:
        out = fn(m, grid, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_splat_point_sharded_grad(data):
    """Gradients flow through the shard_map'd splat and match 1-device."""
    keys, values, _ = data
    mesh = make_mesh(n_data=2, n_points=4)
    m = grid_mapping(keys, SIZES, 3)

    def loss_sharded(v):
        return jnp.sum(splat_max_point_sharded(mesh, m, v, SIZES) ** 2)

    def loss_single(v):
        return jnp.sum(splat_max_mapping(m, v, SIZES) ** 2)

    with mesh:
        g_sh = jax.jit(jax.grad(loss_sharded))(values)
    g_1 = jax.grad(loss_single)(values)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_1), atol=1e-5)


class TestChamferPointSharded:
    """chamfer_point_sharded must reproduce the single-device
    chamfer_distance exactly — distances, global indices, and gradients."""

    def _data(self, n=64, m=96):
        rng = np.random.RandomState(1)
        x = rng.randn(B, n, 3).astype(np.float32)
        y = rng.randn(B, m, 3).astype(np.float32)
        v1 = (rng.rand(B, n) > 0.2)
        v2 = (rng.rand(B, m) > 0.2)
        return jnp.asarray(x), jnp.asarray(y), jnp.asarray(v1), jnp.asarray(v2)

    def test_matches_single_device(self):
        from cloud_transformers_tpu.losses.chamfer import chamfer_distance
        from cloud_transformers_tpu.parallel.point_sharded import (
            chamfer_point_sharded)

        x, y, v1, v2 = self._data()
        mesh = make_mesh(n_data=2, n_points=4)
        ref = chamfer_distance(x, y, chunk_size=32, valid1=v1, valid2=v2)
        fn = jax.jit(lambda *a: chamfer_point_sharded(
            mesh, *a[:2], chunk_size=32, valid1=a[2], valid2=a[3]))
        with mesh:
            out = fn(x, y, v1, v2)
        for o, r in zip(out, ref):
            np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                       atol=1e-6)

    def test_gradients_match_single_device(self):
        from cloud_transformers_tpu.losses.chamfer import chamfer_distance
        from cloud_transformers_tpu.parallel.point_sharded import (
            chamfer_point_sharded)

        x, y, _, _ = self._data()
        mesh = make_mesh(n_data=2, n_points=4)

        def loss_single(x, y):
            d1, d2, _, _ = chamfer_distance(x, y, chunk_size=32)
            return jnp.mean(d1) + jnp.mean(d2)

        def loss_sharded(x, y):
            d1, d2, _, _ = chamfer_point_sharded(mesh, x, y, chunk_size=32)
            return jnp.mean(d1) + jnp.mean(d2)

        g_ref = jax.grad(loss_single, argnums=(0, 1))(x, y)
        with mesh:
            g_sh = jax.jit(jax.grad(loss_sharded, argnums=(0, 1)))(x, y)
        for gs, gr in zip(g_sh, g_ref):
            np.testing.assert_allclose(np.asarray(gs), np.asarray(gr),
                                       atol=1e-6)


def test_f_score_point_sharded_matches_single():
    from cloud_transformers_tpu.losses.fscore import f_score
    from cloud_transformers_tpu.parallel.point_sharded import (
        f_score_point_sharded)

    rng = np.random.RandomState(3)
    pred = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
    gt = jnp.asarray((rng.randn(2, 96, 3) * 1.02).astype(np.float32))
    mesh = make_mesh(n_data=2, n_points=4)
    ref = f_score(pred, gt, threshold=0.5, chunk_size=32)
    with mesh:
        out = jax.jit(lambda p, g: f_score_point_sharded(
            mesh, p, g, threshold=0.5, chunk_size=32))(pred, gt)
    for o, r in zip(out, ref):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=1e-6)
