"""Pallas splat kernel tests (interpret mode on CPU) + portable-path
equivalence of the mapping-based ops."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cloud_transformers_tpu.core.splat_slice as ss
from cloud_transformers_tpu.core.grid_mapping import (
    grid_mapping,
    flat_vertex_indices,
    vertex_weights,
)
from cloud_transformers_tpu.ops.segment import segment_reduce_dense
import cloud_transformers_tpu.ops.pallas_splat as pallas_splat_mod
from cloud_transformers_tpu.ops.pallas_splat import vertex_decomposition


class TestSegmentReduce:
    @pytest.mark.parametrize("op", ["max", "sum"])
    def test_matches_numpy(self, rng, op):
        r, k, g, f = 3, 257, 64, 5
        idx = jnp.asarray(rng.randint(0, g, (r, k)), jnp.int32)
        vals = jnp.asarray(rng.randn(r, k, f), jnp.float32)
        got = np.asarray(segment_reduce_dense(idx, vals, g, op=op))
        want = np.zeros((r, g, f), np.float32)
        for ri in range(r):
            for ki in range(k):
                c = int(idx[ri, ki])
                v = np.asarray(vals[ri, ki])
                if op == "sum":
                    want[ri, c] += v
                else:
                    want[ri, c] = np.maximum(want[ri, c], v)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_empty_cells_are_zero(self, rng):
        idx = jnp.zeros((1, 8), jnp.int32)  # everything lands in cell 0
        vals = jnp.asarray(rng.rand(1, 8, 2), jnp.float32)
        out = segment_reduce_dense(idx, vals, 16, op="max")
        np.testing.assert_allclose(np.asarray(out[0, 1:]), 0.0)


class TestVertexDecomposition:
    @pytest.mark.parametrize("sizes", [(8, 8), (8, 8, 8), (4, 8, 16)])
    def test_weights_sum_to_one(self, rng, sizes):
        dim = len(sizes)
        ks = jnp.asarray(
            rng.uniform(0, min(sizes) - 1.01, (2, 33, dim)), jnp.float32)
        x0, lane0, w_lo, w_hi = vertex_decomposition(ks, sizes)
        total = np.asarray(w_lo).sum(-1) + np.asarray(w_hi).sum(-1)
        np.testing.assert_allclose(total, 1.0, atol=1e-5)

    def test_mapping_matches_grid_positions(self, rng):
        # flat_vertex_indices/vertex_weights describe the same relation as
        # the reference-ordered grid_positions
        from cloud_transformers_tpu.core import grid_positions
        keys = jnp.asarray(rng.uniform(-1, 1, (2, 17, 3, 3)), jnp.float32)
        sizes = (8, 8, 8)
        m = grid_mapping(keys, sizes, 3)
        idx_m = np.asarray(flat_vertex_indices(m, sizes))  # [..., 8]
        w_m = np.asarray(vertex_weights(m))
        w_ref, idx_ref = grid_positions(keys, sizes, 3)
        w_ref, idx_ref = np.asarray(w_ref), np.asarray(idx_ref)
        # same multiset of (index, weight) pairs per point
        for b, p, h in itertools.product(range(2), range(17), range(3)):
            got = sorted(zip(idx_m[b, p, h], w_m[b, p, h]))
            want = sorted(zip(idx_ref[b, p, h], w_ref[b, p, h]))
            gi = [x[0] for x in got if x[1] > 1e-7]
            wi = [x[0] for x in want if x[1] > 1e-7]
            assert set(wi) <= set(got_i for got_i in gi + [g for g, _ in got])
            np.testing.assert_allclose(
                sum(w for _, w in got), sum(w for _, w in want), atol=1e-5)


class TestMappingOps:
    @pytest.mark.parametrize("dim,size", [(2, 16), (3, 8)])
    def test_splat_matches_classic_api(self, rng, dim, size):
        from cloud_transformers_tpu.core import grid_positions, splat_max
        b, p, h, f = 2, 64, 2, 4
        keys = jnp.asarray(rng.uniform(-1, 1, (b, p, h, dim)), jnp.float32)
        vals = jnp.asarray(rng.randn(b, p, h * f), jnp.float32)
        sizes = (size,) * dim
        m = grid_mapping(keys, sizes, dim)
        got = ss.splat_max_mapping(m, vals, sizes)
        w, idx = grid_positions(keys, sizes, dim)
        want = splat_max(w, idx, vals, heads=h, grid_cells=size ** dim)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_slice_matches_classic_api(self, rng):
        from cloud_transformers_tpu.core import grid_positions, slice_grid
        b, p, h, f, size, dim = 2, 64, 2, 4, 8, 3
        keys = jnp.asarray(rng.uniform(-1, 1, (b, p, h, dim)), jnp.float32)
        grid = jnp.asarray(rng.randn(b, h, size ** dim, f), jnp.float32)
        sizes = (size,) * dim
        m = grid_mapping(keys, sizes, dim)
        got = ss.slice_grid_mapping(m, grid, sizes)
        w, idx = grid_positions(keys, sizes, dim)
        want = slice_grid(w, idx, grid, heads=h)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)

    def test_gradients_match_classic_api(self, rng):
        from cloud_transformers_tpu.core import grid_positions, splat_max, \
            slice_grid
        b, p, h, f, size, dim = 1, 32, 2, 3, 8, 3
        keys = jnp.asarray(rng.uniform(-1, 1, (b, p, h, dim)), jnp.float32)
        vals = jnp.asarray(rng.randn(b, p, h * f), jnp.float32)
        sizes = (size,) * dim

        def loss_mapping(v, k):
            m = grid_mapping(k, sizes, dim)
            g = ss.splat_max_mapping(m, v, sizes)
            return jnp.sum(ss.slice_grid_mapping(m, g, sizes) ** 2)

        def loss_classic(v, k):
            w, idx = grid_positions(k, sizes, dim)
            g = splat_max(w, idx, v, heads=h, grid_cells=size ** dim)
            return jnp.sum(slice_grid(w, idx, g, heads=h) ** 2)

        g1 = jax.grad(loss_mapping, argnums=(0, 1))(vals, keys)
        g2 = jax.grad(loss_classic, argnums=(0, 1))(vals, keys)
        np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                                   atol=1e-3)


class TestPortableImplToggle:
    def test_sorted_portable_impl_matches(self, rng):
        """Both portable implementations (interpret-pallas and sorted
        segment reduce) agree, forward and backward."""
        import jax
        b, p, h, f, size, dim = 1, 32, 2, 4, 8, 3
        keys = jnp.asarray(rng.uniform(-1, 1, (b, p, h, dim)), jnp.float32)
        vals = jnp.asarray(rng.randn(b, p, h * f), jnp.float32)
        sizes = (size,) * dim

        def loss(v):
            m = grid_mapping(keys, sizes, dim)
            g = ss.splat_max_mapping(m, v, sizes)
            return jnp.sum(ss.slice_grid_mapping(m, g, sizes) ** 2)

        old = ss.PORTABLE_IMPL
        try:
            ss.PORTABLE_IMPL = "interpret"
            v1, g1 = jax.value_and_grad(loss)(vals)
            ss.PORTABLE_IMPL = "sorted"
            v2, g2 = jax.value_and_grad(loss)(vals)
        finally:
            ss.PORTABLE_IMPL = old
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)

    def test_windowed_lane_path_matches(self, rng):
        """Grids with >= 512 lanes take the windowed-RMW kernel path, which
        has a 128-wide fast branch (point's vertex span inside one aligned
        lane block) and a 256-wide slow branch; random keys exercise both.
        Oracle: the sorted segment reduction."""
        import jax
        b, p, h, f = 1, 96, 1, 4
        sizes = (4, 32, 32)  # lanes = 1024 -> windowed
        keys = jnp.asarray(rng.uniform(-1, 1, (b, p, h, 3)), jnp.float32)
        vals = jnp.asarray(rng.randn(b, p, h * f), jnp.float32)

        def loss(v, k):
            m = grid_mapping(k, sizes, 3)
            g = ss.splat_max_mapping(m, v, sizes)
            return jnp.sum(ss.slice_grid_mapping(m, g, sizes) ** 2)

        old = ss.PORTABLE_IMPL
        try:
            ss.PORTABLE_IMPL = "interpret"
            v1, g1 = jax.value_and_grad(loss, argnums=(0, 1))(vals, keys)
            ss.PORTABLE_IMPL = "sorted"
            v2, g2 = jax.value_and_grad(loss, argnums=(0, 1))(vals, keys)
        finally:
            ss.PORTABLE_IMPL = old
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                                   atol=1e-3)


def _clear_kernel_caches(ps):
    """The kernels are module-level ``jax.jit`` callables whose experiment
    knobs (tile, window mode, bwd mode) are read at TRACE time — without a
    cache clear a knob-flip A/B silently compares a cached trace against
    itself."""
    for fn in (ps.pallas_splat, ps.pallas_slice, ps.pallas_splat_bwd,
               ps.pallas_slice_bwd):
        fn.clear_cache()


class TestTileInvariance:
    """The tile size is a pure scheduling knob: all four kernels must
    produce identical results for different tiles (exercises the tiled
    values layout [R, K/T, F, T] and the payload packing)."""

    def _data(self, sizes, feat, r=2, k=48):
        rng = np.random.RandomState(3)
        keys = jnp.asarray(
            rng.uniform(0, 0.999999, (r, k, len(sizes))).astype(np.float32)
        ) * (jnp.asarray(sizes, jnp.float32) - 1)
        x0, lane0, w_lo, w_hi = pallas_splat_mod.vertex_decomposition(
            keys, sizes)
        values = jnp.asarray(rng.randn(r, k, feat).astype(np.float32))
        return x0, lane0, w_lo, w_hi, values

    def test_tiles_give_identical_results(self, monkeypatch):
        import cloud_transformers_tpu.ops.pallas_splat as ps
        sizes, feat = (8, 8, 8), 8
        x0, lane0, w_lo, w_hi, values = self._data(sizes, feat)
        g_pts = jnp.asarray(np.random.RandomState(6).randn(
            x0.shape[0], x0.shape[1], feat).astype(np.float32))

        results = []
        for tile in (8, 16):
            monkeypatch.setattr(ps, "_pick_tile",
                                lambda k, interp, t=tile: t)
            _clear_kernel_caches(ps)
            grid = ps.pallas_splat(x0, lane0, w_lo, w_hi, values, sizes,
                                   feat, interpret=True)
            sliced = ps.pallas_slice(x0, lane0, w_lo, w_hi, grid, sizes,
                                     feat, interpret=True)
            g = jnp.asarray(np.random.RandomState(5).randn(
                *grid.shape).astype(np.float32))
            bwd = ps.pallas_splat_bwd(x0, lane0, w_lo, w_hi, values, grid,
                                      g, sizes, feat, interpret=True)
            sbwd = ps.pallas_slice_bwd(x0, lane0, w_lo, w_hi, g_pts, grid,
                                       sizes, feat, interpret=True)
            results.append([grid, sliced, *bwd, *sbwd])

        for a, b in zip(*results):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)


class TestWindowModes:
    """The window/address experiment knobs (dual-image 128-lane windows,
    host-precomputed addresses — see the _WINDOW_MODE/_ADDR notes in
    ops/pallas_splat.py) must be bit-equal to the classic defaults on all
    four kernels, including exact-boundary and exact-integer keys."""

    @pytest.mark.parametrize("sizes", [(16, 16, 16), (8, 16, 16)])
    def test_dual_host_matches_classic_kernel(self, rng, sizes):
        import cloud_transformers_tpu.ops.pallas_splat as ps
        r, k, feat = 2, 32, 8
        dim = len(sizes)
        keys = rng.uniform(0, np.array(sizes) - 1.0, (r, k, dim)).astype(
            np.float32)
        keys[0, 0] = np.array(sizes) - 1.0           # exact upper boundary
        keys[0, 1] = 0.0
        keys[0, 2] = np.floor(keys[0, 2])            # exact integer cell
        x0, lane0, w_lo, w_hi = jax.jit(
            vertex_decomposition, static_argnames="sizes")(
                jnp.asarray(keys), tuple(sizes))
        vals = jnp.asarray(rng.randn(r, k, feat), jnp.float32)
        g_pts = jnp.asarray(rng.randn(r, k, feat), jnp.float32)

        outs = {}
        try:
            for mode, addr in (("classic", "kernel"), ("dual", "host"),
                               ("classic", "host")):
                ps._WINDOW_MODE, ps._ADDR = mode, addr
                _clear_kernel_caches(ps)
                grid = ps.pallas_splat(x0, lane0, w_lo, w_hi, vals,
                                       tuple(sizes), feat, interpret=True)
                g = jnp.asarray(rng.randn(*grid.shape), jnp.float32) \
                    if (mode, addr) == ("classic", "kernel") else outs[
                        ("classic", "kernel")][-1]
                sl = ps.pallas_slice(x0, lane0, w_lo, w_hi, grid,
                                     tuple(sizes), feat, interpret=True)
                sbwd = ps.pallas_slice_bwd(x0, lane0, w_lo, w_hi, g_pts,
                                           grid, tuple(sizes), feat,
                                           interpret=True)
                pbwd = ps.pallas_splat_bwd(x0, lane0, w_lo, w_hi, vals,
                                           grid, g, tuple(sizes), feat,
                                           interpret=True)
                outs[(mode, addr)] = [grid, sl, *sbwd, *pbwd, g]
        finally:
            ps._WINDOW_MODE, ps._ADDR = "classic", "kernel"
            _clear_kernel_caches(ps)
        ref = outs[("classic", "kernel")]
        for key in (("dual", "host"), ("classic", "host")):
            for a, b in zip(ref[:-1], outs[key][:-1]):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=1e-6)


class TestSplatBwdModes:
    """The 'winner' splat backward (two claim-free passes: bank-rotated
    scatter-min of the point index, then read-only cotangent routing) must
    be BIT-equal to the serial 'claim' kernel — including exact ties, where
    both must route each cell's cotangent to only the lowest-indexed
    equal-to-max contributor (torch_scatter single-winner semantics)."""

    @pytest.mark.parametrize("sizes", [(8, 8, 8), (16, 128)])
    def test_winner_matches_claim_with_ties(self, rng, sizes):
        import cloud_transformers_tpu.ops.pallas_splat as ps
        r, k, feat = 3, 64, 8
        dim = len(sizes)
        keys = rng.uniform(0, np.array(sizes) - 1.0, (r, k, dim)).astype(
            np.float32)
        # exact duplicate points -> exactly tied max contributions
        for a, b in ((3, 7), (10, 40), (0, 63)):
            keys[:, b] = keys[:, a]
        x0, lane0, w_lo, w_hi = jax.jit(
            vertex_decomposition, static_argnames="sizes")(
                jnp.asarray(keys), tuple(sizes))
        vals = jnp.asarray(rng.randn(r, k, feat), jnp.float32)
        for a, b in ((3, 7), (10, 40), (0, 63)):
            vals = vals.at[:, b].set(vals[:, a])
        grid = ps.pallas_splat(x0, lane0, w_lo, w_hi, vals, tuple(sizes),
                               feat, interpret=True)
        g = jnp.asarray(rng.randn(*grid.shape), jnp.float32)

        outs = {}
        try:
            for mode in ("claim", "winner"):
                ps._BWD_MODE = mode
                _clear_kernel_caches(ps)
                outs[mode] = [np.asarray(x) for x in ps.pallas_splat_bwd(
                    x0, lane0, w_lo, w_hi, vals, grid, g, tuple(sizes),
                    feat, interpret=True)]
        finally:
            ps._BWD_MODE = "winner"
            _clear_kernel_caches(ps)
        for a, b in zip(outs["claim"], outs["winner"]):
            np.testing.assert_array_equal(a, b)
        # the ties actually exercised single-winner routing: the duplicate
        # point pairs must not BOTH receive d_values gradient anywhere
        dval = outs["winner"][2]
        for a, b in ((3, 7), (10, 40), (0, 63)):
            both = (np.abs(dval[:, a]) > 0) & (np.abs(dval[:, b]) > 0)
            assert not both.any()
