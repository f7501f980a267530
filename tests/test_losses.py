"""Loss tests: Chamfer vs dense oracle, EMD vs scipy optimal assignment
(SURVEY.md §4 item 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment
from scipy.spatial.distance import cdist

from cloud_transformers_tpu.losses import (
    chamfer_distance,
    loss_chamfer,
    loss_chamfer_adj,
    emd_auction,
    f_score,
)


def dense_chamfer_oracle(x, y):
    """Port of the reference's pure-torch oracle
    (/root/reference/chamfer_extension/chamfer_pytorch.py) in numpy."""
    d = ((x[:, :, None] - y[:, None]) ** 2).sum(-1)  # [B, N, M]
    return d.min(2), d.min(1), d.argmin(2), d.argmin(1)


class TestChamfer:
    @pytest.mark.parametrize("n,m,chunk", [(64, 64, 1024), (100, 37, 16),
                                           (257, 129, 64)])
    def test_matches_oracle(self, rng, n, m, chunk):
        x = rng.randn(2, n, 3).astype(np.float32)
        y = rng.randn(2, m, 3).astype(np.float32)
        d1, d2, i1, i2 = chamfer_distance(jnp.asarray(x), jnp.asarray(y),
                                          chunk_size=chunk)
        od1, od2, oi1, oi2 = dense_chamfer_oracle(x, y)
        np.testing.assert_allclose(np.asarray(d1), od1, atol=1e-4)
        np.testing.assert_allclose(np.asarray(d2), od2, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(i1), oi1)
        np.testing.assert_array_equal(np.asarray(i2), oi2)

    def test_identical_clouds_zero(self, rng):
        x = jnp.asarray(rng.randn(1, 50, 3), jnp.float32)
        assert float(loss_chamfer(x, x)) < 1e-9

    def test_gradient_matches_reference_formula(self, rng):
        # grad of sum(dist1) wrt xyz1 is 2*(x1 - x2[idx1]) (chamfer.cu:155-177)
        x = jnp.asarray(rng.randn(1, 20, 3), jnp.float32)
        y = jnp.asarray(rng.randn(1, 30, 3), jnp.float32)

        def f(a):
            d1, _, _, _ = chamfer_distance(a, y)
            return jnp.sum(d1)

        g = jax.grad(f)(x)
        _, _, i1, _ = chamfer_distance(x, y)
        want = 2 * (np.asarray(x) - np.asarray(y)[0][np.asarray(i1)[0]])
        np.testing.assert_allclose(np.asarray(g), want, atol=1e-5)

    def test_gradient_flows_to_second_cloud(self, rng):
        x = jnp.asarray(rng.randn(1, 20, 3), jnp.float32)
        y = jnp.asarray(rng.randn(1, 30, 3), jnp.float32)
        g = jax.grad(lambda b: loss_chamfer(x, b))(y)
        assert float(jnp.max(jnp.abs(g))) > 0

    def test_masked_targets_excluded(self, rng):
        x = jnp.asarray(rng.randn(1, 16, 3), jnp.float32)
        y = np.concatenate([np.asarray(x[0]) * 0 + 100, rng.randn(16, 3)],
                           0)[None].astype(np.float32)
        valid2 = jnp.asarray(np.concatenate(
            [np.ones(16), np.zeros(16)])[None], bool)
        d1, _, i1, _ = chamfer_distance(x, jnp.asarray(y), valid2=valid2)
        assert int(np.asarray(i1).max()) < 16  # never picks masked targets


class TestEMD:
    def test_near_optimal_on_small_problem(self, rng):
        # High-iteration auction approaches the Hungarian optimum.
        x = rng.rand(2, 64, 3).astype(np.float32)
        y = rng.rand(2, 64, 3).astype(np.float32)
        dist, assign = emd_auction(jnp.asarray(x), jnp.asarray(y),
                                   eps=0.002, iters=500, chunk_size=64)
        got = np.sqrt(np.asarray(dist)).sum(-1)
        for b in range(2):
            c = cdist(x[b], y[b])
            r, cidx = linear_sum_assignment(c)
            opt = c[r, cidx].sum()
            assert got[b] <= opt * 1.1 + 1e-3, (got[b], opt)

    def test_identity_assignment(self, rng):
        x = rng.rand(1, 32, 3).astype(np.float32)
        dist, assign = emd_auction(jnp.asarray(x), jnp.asarray(x),
                                   eps=0.0005, iters=300, chunk_size=32)
        # matching a cloud to itself: near-zero distance
        assert float(jnp.mean(dist)) < 1e-3

    def test_dist_consistent_with_assignment(self, rng):
        x = rng.rand(1, 64, 3).astype(np.float32)
        y = rng.rand(1, 64, 3).astype(np.float32)
        dist, assign = emd_auction(jnp.asarray(x), jnp.asarray(y),
                                   eps=0.01, iters=20, chunk_size=32)
        a = np.asarray(assign)[0]
        want = ((x[0] - y[0][a]) ** 2).sum(-1)
        np.testing.assert_allclose(np.asarray(dist)[0], want, atol=1e-5)

    def test_assignment_bijective_with_enough_iters(self, rng):
        x = rng.rand(1, 64, 3).astype(np.float32)
        y = rng.rand(1, 64, 3).astype(np.float32)
        _, assign = emd_auction(jnp.asarray(x), jnp.asarray(y),
                                eps=0.001, iters=1000, chunk_size=64)
        assert len(np.unique(np.asarray(assign)[0])) >= 60  # near-bijection

    def test_gradient_only_to_first_cloud(self, rng):
        x = jnp.asarray(rng.rand(1, 32, 3), jnp.float32)
        y = jnp.asarray(rng.rand(1, 32, 3), jnp.float32)

        def f(a, b):
            d, _ = emd_auction(a, b, eps=0.01, iters=10, chunk_size=32)
            return jnp.sum(d)

        gx = jax.grad(f, argnums=0)(x, y)
        gy = jax.grad(f, argnums=1)(x, y)
        assert float(jnp.max(jnp.abs(gx))) > 0
        np.testing.assert_allclose(np.asarray(gy), 0.0)
        # reference formula: 2*(x1 - x2[assignment]) (emd_cuda.cu:284-300)
        _, assign = emd_auction(x, y, eps=0.01, iters=10, chunk_size=32)
        want = 2 * (np.asarray(x)[0] - np.asarray(y)[0][np.asarray(assign)[0]])
        np.testing.assert_allclose(np.asarray(gx)[0], want, atol=1e-5)


class TestEMDCompactedPhases:
    """n >= 2048 triggers the staged-width schedule (full -> N/8 [-> N/64]
    compacted rounds); the compacted tail must still reach a near-bijective,
    near-optimal assignment."""

    def test_staged_matches_protocol_quality(self, rng):
        n = 2048
        x = rng.rand(1, n, 3).astype(np.float32)
        y = (x + 0.02 * rng.randn(1, n, 3)).astype(np.float32)
        dist, assign = emd_auction(jnp.asarray(x), jnp.asarray(y),
                                   eps=0.004, iters=500, chunk_size=512)
        a = np.asarray(assign)[0]
        # near-bijection after convergence
        assert len(np.unique(a)) >= n - 5
        # assignment should be near the identity-quality matching: the
        # matched distance ~ the displacement scale, far below random (~0.5)
        got = float(np.mean(np.sqrt(np.asarray(dist)[0] + 1e-12)))
        assert got < 0.12, got
        # dist consistent with the returned assignment
        want = ((x[0] - y[0][a]) ** 2).sum(-1)
        np.testing.assert_allclose(np.asarray(dist)[0], want, atol=1e-5)


class TestFScore:
    def test_perfect_match(self, rng):
        x = jnp.asarray(rng.rand(2, 64, 3), jnp.float32)
        f, p, r = f_score(x, x, threshold=0.01)
        np.testing.assert_allclose(np.asarray(f), 1.0)

    def test_disjoint_clouds(self, rng):
        x = jnp.asarray(rng.rand(1, 64, 3), jnp.float32)
        f, p, r = f_score(x, x + 10.0, threshold=0.01)
        np.testing.assert_allclose(np.asarray(f), 0.0)

    def test_partial(self):
        # pred = half right, half far away -> precision 0.5, recall
        # depends on coverage
        gt = jnp.asarray(np.linspace(0, 1, 32)[:, None].repeat(3, 1)[None],
                         jnp.float32)
        pred = np.asarray(gt).copy()
        pred[0, 16:] += 100.0
        f, p, r = f_score(jnp.asarray(pred), gt, threshold=0.01)
        np.testing.assert_allclose(float(p[0]), 0.5, atol=1e-6)
        np.testing.assert_allclose(float(r[0]), 0.5, atol=1e-6)


class TestPallasBidKernel:
    """ops/pallas_emd.pallas_top2 must match the XLA scan `_top2_values`
    exactly (values AND first-occurrence argmax ties) — it replaces the
    scan for compacted auction rounds on TPU."""

    @pytest.mark.parametrize("b,w,m", [(2, 256, 1024), (2, 300, 1000),
                                       (1, 256, 256)])
    def test_matches_xla_scan(self, rng, b, w, m):
        from cloud_transformers_tpu.losses.emd import _top2_values
        from cloud_transformers_tpu.ops.pallas_emd import pallas_top2
        x1 = jnp.asarray(rng.rand(b, w, 3), jnp.float32)
        x2 = jnp.asarray(rng.rand(b, m, 3), jnp.float32)
        price = jnp.asarray(rng.rand(b, m) * 0.1, jnp.float32)
        bs, bt, bi = _top2_values(x1, x2, price, 2048)
        ps, pt, pi = pallas_top2(x1, x2, price, interpret=True)
        # values agree to float-reassociation noise (~1e-5 on bids ~3.0;
        # the auction's eps slack is 4e-3, 400x larger); argmax EXACT
        np.testing.assert_allclose(np.asarray(bs), np.asarray(ps),
                                   rtol=0, atol=2e-5)
        np.testing.assert_allclose(np.asarray(bt), np.asarray(pt),
                                   rtol=0, atol=2e-5)
        np.testing.assert_array_equal(np.asarray(bi), np.asarray(pi))

    def test_duplicate_target_ties(self, rng):
        from cloud_transformers_tpu.losses.emd import _top2_values
        from cloud_transformers_tpu.ops.pallas_emd import pallas_top2
        b, w = 1, 256
        x1 = jnp.asarray(rng.rand(b, w, 3), jnp.float32)
        half = jnp.asarray(rng.rand(b, 300, 3), jnp.float32)
        x2 = jnp.concatenate([half, half], axis=1)   # exact duplicates
        price = jnp.zeros((b, 600), jnp.float32)
        bs, bt, bi = _top2_values(x1, x2, price, 2048)
        ps, pt, pi = pallas_top2(x1, x2, price, interpret=True)
        np.testing.assert_allclose(np.asarray(bs), np.asarray(ps),
                                   rtol=0, atol=2e-5)
        # on an exact duplicate, second-best == best and argmax takes the
        # FIRST occurrence in both implementations
        np.testing.assert_allclose(np.asarray(bt), np.asarray(pt),
                                   rtol=0, atol=2e-5)
        np.testing.assert_array_equal(np.asarray(bi), np.asarray(pi))


class TestPallasAuctionWindow:
    """ops/pallas_emd.pallas_auction_window — the fused multi-round tail.

    Exactness claim: one window of R rounds with a FIXED bidder set equals
    R XLA `_auction_round` calls with the same set, re-masked each round by
    the current assignment (assigned lanes stop bidding, in-window evicted
    lanes resume) — owner map and derived assignment EXACT, prices to f32
    reassociation noise."""

    def _mid_state(self, rng, b, n, eps, full_rounds=6):
        from cloud_transformers_tpu.losses.emd import _auction_round
        x1 = jnp.asarray(rng.rand(b, n, 3), jnp.float32)
        x2 = jnp.asarray(rng.rand(b, n, 3), jnp.float32)
        state = (jnp.full((b, n), -1, jnp.int32),
                 jnp.full((b, n), -1, jnp.int32),
                 jnp.zeros((b, n), jnp.float32))
        for _ in range(full_rounds):
            state = _auction_round(x1, x2, eps, 2048, state, last=False)
        return x1, x2, state

    def test_window_matches_xla_rounds(self, rng):
        from cloud_transformers_tpu.losses.emd import (
            _auction_round, _compact_unassigned)
        from cloud_transformers_tpu.ops.pallas_emd import (
            _window_m_tile, pack_col, pack_targets, pallas_auction_window,
            unpack_col)
        b, n, w, r_rounds, eps = 2, 512, 128, 5, 0.02
        x1, x2, state = self._mid_state(rng, b, n, eps)
        assignment, inv, price = state
        idx = _compact_unassigned(assignment, w)
        j_real = jnp.where(idx < n, idx, n).astype(jnp.int32)
        x1w = jnp.take_along_axis(x1, jnp.minimum(idx, n - 1)[..., None], 1)

        # XLA emulation: fixed window, re-masked by current assignment
        st = state
        for _ in range(r_rounds):
            asn_pad = jnp.pad(st[0], ((0, 0), (0, 1)), constant_values=0)
            live = jnp.take_along_axis(asn_pad, jnp.minimum(idx, n), 1) < 0
            st = _auction_round(x1, x2, eps, 2048, st, last=False,
                                idx=jnp.where((idx < n) & live, idx, n))
        want_assign, want_inv, want_price = st

        m_tile = _window_m_tile(w, n)
        prb2, invb2, used = pallas_auction_window(
            x1w, j_real, pack_targets(x2, m_tile), pack_col(price, m_tile),
            pack_col(inv, m_tile, fill=-1), r_rounds, eps, n=n,
            rounds_cap=r_rounds, interpret=True)
        got_inv = unpack_col(invb2, n)
        np.testing.assert_array_equal(np.asarray(got_inv),
                                      np.asarray(want_inv))
        np.testing.assert_allclose(np.asarray(unpack_col(prb2, n)),
                                   np.asarray(want_price), atol=2e-5)
        from cloud_transformers_tpu.losses.emd import _assignment_from_inv
        np.testing.assert_array_equal(
            np.asarray(_assignment_from_inv(got_inv, n)),
            np.asarray(want_assign))
        assert (np.asarray(used) <= r_rounds).all()

    def test_full_auction_through_window_tail(self, rng, monkeypatch):
        """End-to-end emd_auction with the window tail (interpret mode):
        converges under budget, bijective assignment, eps-optimal cost vs
        the pure-XLA staged path."""
        import cloud_transformers_tpu.losses.emd as emd
        b, n = 2, 1024
        x2 = rng.rand(b, n, 3).astype(np.float32)
        perm = np.stack([rng.permutation(n) for _ in range(b)])
        x1 = np.take_along_axis(x2, perm[..., None], axis=1) \
            + 0.02 * rng.randn(b, n, 3).astype(np.float32)
        x1, x2 = jnp.asarray(x1), jnp.asarray(x2)

        monkeypatch.setattr(emd, "_WINDOW_TAIL", True)
        monkeypatch.setattr(emd, "_WINDOW_MIN_N", 512)
        monkeypatch.setattr(emd, "_WINDOW_INTERPRET", True)
        emd.emd_auction_with_rounds.clear_cache()
        try:
            d_w, a_w, r_w = emd.emd_auction_with_rounds(
                x1, x2, eps=0.005, iters=3000)
            d_w, a_w = np.asarray(d_w), np.asarray(a_w)
        finally:
            emd.emd_auction_with_rounds.clear_cache()

        monkeypatch.setattr(emd, "_WINDOW_TAIL", False)
        monkeypatch.setattr(emd, "_WINDOW_INTERPRET", False)
        try:
            d_x, a_x, r_x = emd.emd_auction_with_rounds(
                x1, x2, eps=0.005, iters=3000)
            d_x, a_x = np.asarray(d_x), np.asarray(a_x)
        finally:
            emd.emd_auction_with_rounds.clear_cache()

        assert int(r_w) < 2999          # converged, not budget-capped
        for bi in range(b):
            assert len(set(a_w[bi].tolist())) == n
            assert len(set(a_x[bi].tolist())) == n
        rel = abs(d_w.sum() - d_x.sum()) / d_x.sum()
        assert rel < 0.02, rel
