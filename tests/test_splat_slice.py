"""Splat/Slice kernel-vs-oracle and gradient tests (SURVEY.md §4 items 2-3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cloud_transformers_tpu.core import grid_positions, splat_max, slice_grid
from cloud_transformers_tpu.core.noise import sphere_noise, partial_postprocess


def check_grads_fd(f, x, eps=1e-3, atol=1e-2, rtol=1e-2, n_probe=10, seed=0):
    """Compare reverse-mode grad of scalar f against central finite differences
    along random probe directions (jax.test_util.check_grads was removed in
    jax 0.9)."""
    g = jax.grad(f)(x)
    r = np.random.RandomState(seed)
    for _ in range(n_probe):
        v = jnp.asarray(r.randn(*x.shape), x.dtype)
        fd = (f(x + eps * v) - f(x - eps * v)) / (2 * eps)
        an = jnp.vdot(g, v)
        np.testing.assert_allclose(np.asarray(fd), np.asarray(an),
                                   atol=atol, rtol=rtol)


def oracle_splat(weights, flat_idx, values, heads, grid_cells):
    """Dense numpy scatter-max oracle with zero-initialized grid."""
    b, p, h, s = weights.shape
    f = values.shape[-1] // heads
    v = values.reshape(b, p, h, f)
    grid = np.zeros((b, h, grid_cells, f), np.float32)
    for bi in range(b):
        for pi in range(p):
            for hi in range(h):
                for si in range(s):
                    g = flat_idx[bi, pi, hi, si]
                    contrib = weights[bi, pi, hi, si] * v[bi, pi, hi]
                    grid[bi, hi, g] = np.maximum(grid[bi, hi, g], contrib)
    return grid


def rand_inputs(rng, b=2, p=32, h=3, f=5, size=4, dim=3):
    keys = jnp.asarray(rng.uniform(-1, 1, (b, p, h, dim)), jnp.float32)
    w, idx = grid_positions(keys, size, dim)
    values = jnp.asarray(rng.randn(b, p, h * f), jnp.float32)
    return w, idx, values, size ** dim


class TestSplat:
    @pytest.mark.parametrize("dim", [2, 3])
    def test_matches_oracle(self, rng, dim):
        w, idx, values, g = rand_inputs(rng, dim=dim)
        got = splat_max(w, idx, values, heads=3, grid_cells=g)
        want = oracle_splat(np.asarray(w), np.asarray(idx), np.asarray(values),
                            3, g)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_negative_contributions_clamped_to_zero(self, rng):
        # zero-init grid means cells never go below 0 (torch_scatter out=zeros
        # semantics, reference cloud_transform.py:164-173).
        w, idx, values, g = rand_inputs(rng)
        got = splat_max(w, idx, -jnp.abs(values), heads=3, grid_cells=g)
        assert float(jnp.min(got)) >= 0.0

    def test_mask_zeroes_points(self, rng):
        w, idx, values, g = rand_inputs(rng, b=2, p=32)
        mask = jnp.asarray(np.repeat([1.0, 0.0], 16)[None].repeat(2, 0))
        got = splat_max(w, idx, values, heads=3, grid_cells=g, pts_mask=mask)
        # masked points contribute exactly zero
        w2, idx2 = w[:, :16], idx[:, :16]
        got2 = splat_max(w2, idx2, values[:, :16], heads=3, grid_cells=g)
        np.testing.assert_allclose(np.asarray(got), np.asarray(got2),
                                   atol=1e-6)

    def test_gradient_routes_to_argmax_winner(self):
        # Two points in the same cell: gradient flows only to the winner.
        w = jnp.ones((1, 2, 1, 1))
        idx = jnp.zeros((1, 2, 1, 1), jnp.int32)

        def f(values):
            return jnp.sum(splat_max(w, idx, values, heads=1, grid_cells=2))

        g = jax.grad(f)(jnp.array([[[3.0], [1.0]]]))
        np.testing.assert_allclose(np.asarray(g), [[[1.0], [0.0]]])

    def test_gradient_blocked_when_zero_init_wins(self):
        # All contributions negative -> cell keeps its 0 init -> no gradient.
        w = jnp.ones((1, 1, 1, 1))
        idx = jnp.zeros((1, 1, 1, 1), jnp.int32)

        def f(values):
            return jnp.sum(splat_max(w, idx, values, heads=1, grid_cells=2))

        g = jax.grad(f)(jnp.array([[[-3.0]]]))
        np.testing.assert_allclose(np.asarray(g), [[[0.0]]])

    def test_finite_difference_gradient(self, rng):
        w, idx, values, g = rand_inputs(rng, b=1, p=8, h=2, f=3, size=3)

        def f(v):
            return jnp.sum(splat_max(w, idx, v, heads=2, grid_cells=g) ** 2)

        check_grads_fd(f, values)


class TestSlice:
    def test_round_trip_constant_feature(self, rng):
        # Splat a constant 1-feature, slice back: occupied-cell points whose
        # entire support is occupied recover ~their weight-weighted max.
        # Stronger invariant: slicing a constant grid returns the constant
        # (weights sum to 1).
        w, idx, _, g = rand_inputs(rng, h=2, f=1)
        grid = jnp.full((2, 2, g, 1), 7.0)
        out = slice_grid(w, idx, grid, heads=2)
        np.testing.assert_allclose(np.asarray(out), 7.0, atol=1e-4)

    def test_matches_manual_gather(self, rng):
        w, idx, values, g = rand_inputs(rng, b=1, p=4, h=2, f=3)
        grid = jnp.asarray(rng.randn(1, 2, g, 3), jnp.float32)
        out = slice_grid(w, idx, grid, heads=2)
        want = np.zeros((1, 4, 2, 3), np.float32)
        for pi in range(4):
            for hi in range(2):
                for si in range(8):
                    want[0, pi, hi] += (np.asarray(w)[0, pi, hi, si]
                                        * np.asarray(grid)[0, hi,
                                                           np.asarray(idx)[0, pi, hi, si]])
        np.testing.assert_allclose(np.asarray(out),
                                   want.reshape(1, 4, 6), atol=1e-5)

    def test_gradient(self, rng):
        w, idx, _, g = rand_inputs(rng, b=1, p=4, h=2, f=2)
        grid = jnp.asarray(rng.randn(1, 2, g, 2), jnp.float32)

        def f(gr):
            return jnp.sum(slice_grid(w, idx, gr, heads=2) ** 2)

        check_grads_fd(f, grid)


class TestNoise:
    def test_sphere_noise_on_unit_sphere(self):
        pts = sphere_noise(jax.random.PRNGKey(0), 2, 1000)
        assert pts.shape == (2, 1000, 3)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(pts), axis=-1), 1.0, atol=1e-5)
        # roughly mean-zero (uniform on sphere)
        assert np.abs(np.asarray(pts).mean(axis=(0, 1))).max() < 0.1

    def test_partial_postprocess(self):
        key = jax.random.PRNGKey(1)
        partial = np.zeros((2, 8, 3), np.float32)
        partial[0, :5] = np.random.RandomState(0).randn(5, 3)
        partial[1, :3] = np.random.RandomState(1).randn(3, 3)
        parts, noise = partial_postprocess(key, jnp.asarray(partial), 16)
        assert parts.shape == (2, 8, 3)
        assert noise.shape == (2, 16, 4)
        # labels: exactly n_valid ones
        np.testing.assert_array_equal(
            np.asarray(noise[..., 3]).sum(-1), [5, 3])
        # real slots carry the real points
        np.testing.assert_allclose(np.asarray(noise[0, :5, :3]),
                                   partial[0, :5], atol=1e-6)
        # noise slots lie on the unit sphere
        tail = np.asarray(noise[0, 5:, :3])
        np.testing.assert_allclose(np.linalg.norm(tail, -1 if False else None,
                                                  axis=-1), 1.0, atol=1e-5)
        # parts has no zero rows
        assert not np.any(np.all(np.asarray(parts) == 0, axis=-1))


class TestTieBreak:
    """Exact duplicated points (the KPConv repeat-padding case,
    s3dis_closer.py:325-337) tie on every cell they win; torch_scatter
    routes the max gradient to exactly ONE argmax contribution.  Ours picks
    the lowest point index, deterministically, on every backend path."""

    def _dup_case(self, dim=3, dup_src=0, dup_dst=5, p=16, heads=2, feat=4):
        import jax
        key = jax.random.PRNGKey(7)
        k1, k2, k3 = jax.random.split(key, 3)
        sizes = (8,) * dim
        keys = jnp.tanh(jax.random.normal(k1, (1, p, heads, dim)))
        values = jax.random.normal(k2, (1, p, heads * feat))
        keys = keys.at[:, dup_dst].set(keys[:, dup_src])
        values = values.at[:, dup_dst].set(values[:, dup_src])
        cot_shape = (1, heads, int(np.prod(sizes)), feat)
        cot = jax.random.normal(k3, cot_shape)
        return sizes, keys, values, cot

    def _grads(self, sizes, keys, values, cot):
        from cloud_transformers_tpu.core import grid_mapping, splat_max_mapping

        def loss(values):
            m = grid_mapping(keys, sizes, len(sizes))
            grid = splat_max_mapping(m, values, sizes)
            return jnp.sum(grid * cot)

        return jax.grad(loss)(values)

    @pytest.mark.parametrize("dim", [2, 3])
    def test_duplicate_point_single_grad_path_kernel(self, dim):
        """Default CPU path = interpret-mode Pallas backward (the kernel's
        consume-the-cotangent tie-break)."""
        sizes, keys, values, cot = self._dup_case(dim=dim)
        g = self._grads(sizes, keys, values, cot)
        # the duplicate (higher index) receives exactly zero gradient...
        np.testing.assert_allclose(np.asarray(g[0, 5]), 0.0, atol=0)
        # ...and the winner carries the full cotangent: grads match a run
        # where the duplicate is masked out entirely
        from cloud_transformers_tpu.core import grid_mapping, splat_max_mapping
        mask = jnp.ones(values.shape[1]).at[5].set(0.0)[None]

        def loss_masked(values):
            m = grid_mapping(keys, sizes, len(sizes))
            grid = splat_max_mapping(m, values, sizes, pts_mask=mask)
            return jnp.sum(grid * cot)

        g_masked = jax.grad(loss_masked)(values)
        np.testing.assert_allclose(np.asarray(g[0, 0]),
                                   np.asarray(g_masked[0, 0]), atol=1e-6)
        assert float(jnp.abs(g[0, 0]).max()) > 0

    @pytest.mark.parametrize("dim", [2, 3])
    def test_duplicate_point_single_grad_path_portable(self, dim,
                                                       monkeypatch):
        """FORCE_XLA_PATH exercises the sorted-segment portable backward
        (_splat_m_bwd_portable + _winner_only)."""
        from cloud_transformers_tpu.core import splat_slice as ss
        monkeypatch.setattr(ss, "FORCE_XLA_PATH", True)
        sizes, keys, values, cot = self._dup_case(dim=dim)
        g = self._grads(sizes, keys, values, cot)
        np.testing.assert_allclose(np.asarray(g[0, 5]), 0.0, atol=0)
        assert float(jnp.abs(g[0, 0]).max()) > 0

    @pytest.mark.parametrize("dim", [2, 3])
    def test_fwd_winner_matches_two_phase_kernel_layout(self, dim):
        """The AD-forward winner map (FWD_WINNER: argmax tracked during the
        scatter, backward = one routing pass) must give BIT-identical
        gradients to the two-phase backward on the kernel-layout path,
        including exact duplicate-point ties."""
        from cloud_transformers_tpu.core import (
            grid_mapping, splat_max_mapping_k, slice_grid_mapping_k)
        from cloud_transformers_tpu.core import splat_slice as ss
        import cloud_transformers_tpu.ops.pallas_splat as ps
        sizes, keys, values, _ = self._dup_case(dim=dim)
        hf = values.shape[-1]

        def loss(keys, values):
            m = grid_mapping(keys, sizes, len(sizes))
            gk = splat_max_mapping_k(m, values, sizes)
            out = slice_grid_mapping_k(m, gk, sizes, hf)
            return jnp.sum(jnp.tanh(out) * 0.01)

        grads = {}
        old = ss.FWD_WINNER
        try:
            for fw in (False, True):
                ss.FWD_WINNER = fw
                for fn in (ps.pallas_splat, ps.pallas_splat_bwd,
                           ps.pallas_splat_bwd_routed):
                    fn.clear_cache()
                grads[fw] = jax.jit(jax.grad(loss, argnums=(0, 1)))(
                    keys, values)
        finally:
            ss.FWD_WINNER = old
        for a, b in zip(jax.tree_util.tree_leaves(grads[False]),
                        jax.tree_util.tree_leaves(grads[True])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # and the duplicate still gets exactly zero value-gradient
        np.testing.assert_allclose(
            np.asarray(grads[True][1][0, 5]), 0.0, atol=0)

    def test_duplicate_point_single_grad_path_core(self):
        """splat_max (_splat_core segment path) with two equal contributions
        in one cell: only the first gets the cotangent."""
        w = jnp.ones((1, 3, 1, 1))
        idx = jnp.asarray([[[[0]], [[0]], [[1]]]], jnp.int32)

        def f(values):
            grid = splat_max(w, idx, values, heads=1, grid_cells=2)
            return jnp.sum(grid * jnp.asarray([3.0, 5.0])[None, None, :,
                                                          None])

        # points 0 and 1 tie at cell 0 with value 2.0; point 2 owns cell 1
        g = jax.grad(f)(jnp.array([[[2.0], [2.0], [4.0]]]))
        np.testing.assert_allclose(np.asarray(g), [[[3.0], [0.0], [5.0]]])
