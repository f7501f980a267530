"""Unit tests for the grid positioning math (SURVEY.md §4 plan item 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cloud_transformers_tpu.core import (
    balance_op,
    bilinear_coords,
    trilinear_coords,
    grid_positions,
    so3_exponential_map,
)


class TestLinearCoords:
    def test_trilinear_weights_sum_to_one(self, rng):
        keys = jnp.asarray(rng.uniform(0, 6.999, size=(2, 17, 3)), jnp.float32)
        w, idx = trilinear_coords(keys)
        assert w.shape == (2, 17, 8)
        assert idx.shape == (2, 17, 8, 3)
        np.testing.assert_allclose(np.sum(np.asarray(w), -1), 1.0, atol=1e-5)

    def test_bilinear_weights_sum_to_one(self, rng):
        keys = jnp.asarray(rng.uniform(0, 6.999, size=(5, 2)), jnp.float32)
        w, idx = bilinear_coords(keys)
        assert w.shape == (5, 4)
        np.testing.assert_allclose(np.sum(np.asarray(w), -1), 1.0, atol=1e-6)

    def test_weights_reconstruct_position(self, rng):
        # The weighted sum of cell-vertex coordinates equals the query point
        # (the defining property of bi/trilinear coordinates).
        keys = jnp.asarray(rng.uniform(0, 6.999, size=(3, 11, 3)), jnp.float32)
        w, idx = trilinear_coords(keys)
        recon = jnp.sum(w[..., None] * idx.astype(jnp.float32), axis=-2)
        np.testing.assert_allclose(np.asarray(recon), np.asarray(keys),
                                   atol=1e-4)

    def test_exact_grid_point(self):
        keys = jnp.array([[2.0, 3.0, 5.0]])
        w, idx = trilinear_coords(keys)
        np.testing.assert_allclose(np.asarray(w[0]),
                                   [1, 0, 0, 0, 0, 0, 0, 0], atol=1e-6)
        np.testing.assert_array_equal(np.asarray(idx[0, 0]), [2, 3, 5])


class TestGridPositions:
    @pytest.mark.parametrize("dim,size", [(2, 8), (3, 8), (2, (8, 16)),
                                          (3, (4, 8, 16))])
    def test_indices_in_range(self, rng, dim, size):
        keys = jnp.asarray(rng.uniform(-1.5, 1.5, size=(2, 64, 4, dim)),
                           jnp.float32)
        w, flat = grid_positions(keys, size, dim)
        sizes = (size,) * dim if isinstance(size, int) else size
        g = int(np.prod(sizes))
        assert w.shape == (2, 64, 4, 2 ** dim)
        assert flat.shape == (2, 64, 4, 2 ** dim)
        assert int(jnp.min(flat)) >= 0
        assert int(jnp.max(flat)) < g
        np.testing.assert_allclose(np.sum(np.asarray(w), -1), 1.0, atol=1e-5)

    def test_boundary_keys_stay_in_range(self):
        keys = jnp.array([[[[-1.0, 1.0, -5.0]]]])
        w, flat = grid_positions(keys, 8, 3)
        assert int(jnp.min(flat)) >= 0
        assert int(jnp.max(flat)) < 512

    def test_gradient_balancing_identity_backward(self):
        # forward scales, backward is identity (reference
        # cloud_transform.py:12-26).
        g = jax.grad(lambda x: jnp.sum(balance_op(x, 10.0)))(jnp.ones((3,)))
        np.testing.assert_allclose(np.asarray(g), 1.0)

    def test_grid_positions_gradient_resolution_invariant(self, rng):
        # Because of gradient balancing, d(weights)/d(keys) magnitude must not
        # scale with grid resolution.
        keys = jnp.asarray(rng.uniform(-0.9, 0.9, size=(1, 4, 1, 3)),
                           jnp.float32)

        def loss(k, size):
            w, _ = grid_positions(k, size, 3)
            return jnp.sum(w * w)

        g8 = jax.grad(loss)(keys, 8)
        g64 = jax.grad(loss)(keys, 64)
        r = np.abs(np.asarray(g64)).mean() / np.abs(np.asarray(g8)).mean()
        assert r < 4.0, f"gradient grew {r}x with resolution"


class TestSO3:
    def test_identity(self):
        r = so3_exponential_map(jnp.zeros((4, 3)))
        np.testing.assert_allclose(np.asarray(r),
                                   np.broadcast_to(np.eye(3), (4, 3, 3)),
                                   atol=1e-4)

    def test_rotation_matrix_properties(self, rng):
        v = jnp.asarray(rng.randn(16, 3), jnp.float32)
        r = np.asarray(so3_exponential_map(v))
        np.testing.assert_allclose(r @ r.transpose(0, 2, 1),
                                   np.broadcast_to(np.eye(3), (16, 3, 3)),
                                   atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-5)

    def test_known_rotation(self):
        # pi/2 about z: x -> y
        r = so3_exponential_map(jnp.array([[0.0, 0.0, np.pi / 2]]))
        np.testing.assert_allclose(np.asarray(r[0] @ np.array([1.0, 0, 0])),
                                   [0, 1, 0], atol=1e-5)

    def test_gradient_finite_at_zero(self):
        g = jax.grad(lambda v: jnp.sum(so3_exponential_map(v)))(
            jnp.zeros((1, 3)))
        assert np.all(np.isfinite(np.asarray(g)))
