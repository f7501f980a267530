"""Approximate Earth Mover's Distance via the auction algorithm, pure XLA.

TPU-native replacement for the reference CUDA extension
(/root/reference/emd_linear/emd_cuda.cu, emd_module.py).  Same algorithm:
``iters`` rounds of {bid -> resolve conflicts -> assign with eviction}, with a
final round that force-assigns every remaining unassigned point (possibly
non-bijectively), then distances through the fixed assignment.

The CUDA kernel compacts the unassigned set into a list (emd_cuda.cu:85-93);
a data-dependent shape doesn't translate to XLA directly, so the compaction
happens at FIXED widths: once (almost) everyone is assigned, rounds gather at
most ``cap`` unassigned points (cumsum positions + scatter, O(N) per round)
and only those bid — a staged-width schedule [N, N/8, N/64].  Without this,
every round costs the full O(N*M) bid search and the 3000-round eval protocol
(train_inpainter.py:267-269) spends ~95% of its wall time on rounds where a
handful of points are still bidding.  Any-subset bidding preserves auction
convergence (prices are monotone; epsilon-optimality is order-free).  The
per-round best/second-best search over targets is chunked so peak memory is
``B * W * chunk`` (each chunk's distances come from one MXU matmul).

Semantics notes (kept identical to the reference):
  * bid value: ``3 - ||x1_j - x2_k|| - price_k`` — euclidean, clouds assumed
    normalized to [0, 1] (emd_cuda.cu:146).
  * bid increment: ``best - better + eps`` (emd_cuda.cu:175).
  * conflict resolution: highest increment per target wins (ties: lowest
    bidder index — the CUDA version is nondeterministic among exact ties,
    emd_cuda.cu:181-194).
  * gradient: only to ``xyz1``, through the fixed assignment
    (emd_cuda.cu:284-316, emd_module.py:62-70).
  * constraints n == m relaxed-checked; n need not be a multiple of 1024 here.
"""

from functools import partial

import jax
import jax.numpy as jnp

_NEG = -1e9

# Fused Pallas bid search (ops/pallas_emd.py) for rounds at or above this
# bidder width; narrower rounds keep the XLA scan.  Measured on v5e (B=8,
# M=16384, ms/round): W=256 XLA 1.0 / Pallas 1.6; W=512 2.1/3.1; W=1024
# 2.8/2.7; W=2048 6.2/4.2; W=16384 47.8/25.1 — the kernel's fused value+
# top-2 pass wins once the [M, W] work amortizes its serial target loop;
# below that XLA's MXU einsum chunks win.  None disables.  Reference
# analog: Bid kernel, emd_cuda.cu:95-179.
_PALLAS_BID_MIN_WIDTH = 1024

# Fused multi-round window tail (ops/pallas_emd.py pallas_auction_window):
# once unassigned <= 2 * _WINDOW_W, the convergence tail runs as windows of
# up to _WINDOW_ROUNDS auction rounds per pallas call, price and owner state
# resident in VMEM across rounds.
#
# BUILT, MEASURED, REJECTED as default (round 5) — the round-4 hypothesis
# ("the 3000-round tail is dispatch-bound at ~1.7 ms/round") is wrong:
# measured on v5e (B=8, N=M=16384, tools/emd_window_cost.py),
#
#   * in-kernel marginal round: 1.6 ms (W=256) / 1.2 ms (W=512) — the SAME
#     or more than the dispatched XLA compacted round (1.0-1.7 ms): the
#     tail is bound by the O(M*W) dense value sweep on the VPU, which XLA
#     already runs near roofline, not by per-round dispatch;
#   * fixed cost per window call: 3.4-3.6 ms (state copy-in + launch);
#   * auction dynamics void the fusion premise: while unassigned >> W every
#     window assigns its whole bidder set against free targets in ~2 rounds
#     (measured used=2-3) and exits, so the fixed cost amortizes over ~2
#     budget rounds -> ~3.3 ms/round effective;
#   * end-to-end eval protocol (eps=0.004, iters=3000, B=8 x 16384):
#     8.3-11.6 s/batch with the window tail vs 5.2-5.7 s staged-XLA.
#
# Sparse/shortlist reformulations are priced out by the same ~10-15
# cycle/element dynamic-access floor as the splat kernel (ops/pallas_splat
# module notes): a per-round [W, C] price gather alone would cost more than
# the dense sweep it saves.  The kernel and its exactness tests stay
# in-tree (tests/test_losses.py::TestPallasAuctionWindow); flip this flag
# to re-enable.
_WINDOW_TAIL = False
_WINDOW_W = 512
_WINDOW_ROUNDS = 64
_WINDOW_MIN_N = 4096
# test hook: run the window tail through the Pallas interpreter on CPU
# (tests/test_losses.py), bypassing the platform dispatch
_WINDOW_INTERPRET = False


def _top2_dispatch(x1w, x2, price, chunk_size):
    w = x1w.shape[1]
    if _PALLAS_BID_MIN_WIDTH is None or w < _PALLAS_BID_MIN_WIDTH:
        return _top2_values(x1w, x2, price, chunk_size)
    from cloud_transformers_tpu.ops.pallas_emd import pallas_top2
    return jax.lax.platform_dependent(
        x1w, x2, price,
        tpu=pallas_top2,
        default=lambda a, b, c: _top2_values(a, b, c, chunk_size))


def _top2_values(x1, x2, price, chunk_size):
    """Per x1 point: best and second-best bid value over x2, plus argmax.

    Returns (best [B,N], better [B,N], best_i [B,N]).
    """
    b, n, _ = x1.shape
    m = x2.shape[1]
    num_chunks = max(1, -(-m // chunk_size))
    pad = num_chunks * chunk_size - m
    if pad:
        # pad with far-away dummy targets (never win: value -> very negative)
        x2p = jnp.concatenate(
            [x2, jnp.full((b, pad, 3), 1e6, x2.dtype)], axis=1)
        pricep = jnp.concatenate([price, jnp.zeros((b, pad), price.dtype)],
                                 axis=1)
    else:
        x2p, pricep = x2, price
    x2c = x2p.reshape(b, num_chunks, chunk_size, 3).transpose(1, 0, 2, 3)
    pc = pricep.reshape(b, num_chunks, chunk_size).transpose(1, 0, 2)
    x1_sq = jnp.sum(x1 * x1, axis=-1)  # [B, N]

    def one_chunk(carry, xs):
        best, better, best_i = carry
        x2_chunk, price_chunk, k0 = xs
        cross = jnp.einsum("bnd,bcd->bnc", x1, x2_chunk,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
        d_sq = (x1_sq[..., None] + jnp.sum(x2_chunk * x2_chunk, -1)[:, None, :]
                - 2.0 * cross)
        value = 3.0 - jnp.sqrt(jnp.clip(d_sq, 0.0)) - price_chunk[:, None, :]
        # chunk top-2
        c1 = jnp.max(value, axis=-1)
        a1 = jnp.argmax(value, axis=-1).astype(jnp.int32)
        masked = jnp.where(
            jax.nn.one_hot(a1, value.shape[-1], dtype=bool), _NEG, value)
        c2 = jnp.max(masked, axis=-1)
        # merge running top-2 with chunk top-2
        new_best = jnp.maximum(best, c1)
        new_better = jnp.maximum(jnp.minimum(best, c1), jnp.maximum(better, c2))
        new_best_i = jnp.where(c1 > best, k0 + a1, best_i)
        return (new_best, new_better, new_best_i), None

    init = (jnp.full((b, n), _NEG), jnp.full((b, n), _NEG),
            jnp.zeros((b, n), jnp.int32))
    k0s = jnp.arange(num_chunks, dtype=jnp.int32) * chunk_size
    (best, better, best_i), _ = jax.lax.scan(one_chunk, init, (x2c, pc, k0s))
    return best, better, best_i


def _compact_unassigned(assignment, cap):
    """First ``cap`` unassigned point ids per batch row (sentinel n beyond).

    O(N) per call: cumsum positions + one scatter — no sort."""
    b, n = assignment.shape
    unass = assignment < 0
    pos = jnp.cumsum(unass, axis=1) - 1            # rank among unassigned
    dest = jnp.where(unass & (pos < cap), pos, cap)
    j_ids = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (b, n))
    idx = jnp.full((b, cap), n, jnp.int32).at[
        jnp.arange(b)[:, None], dest].min(j_ids, mode="drop")
    return idx


def _auction_round(x1, x2, eps, chunk_size, state, last, idx=None):
    """One auction round: bid, resolve winners, assign with eviction.

    ``idx`` [B, W] selects which points bid this round (sentinel n = no-op
    lane); None means all N points bid (W == N)."""
    assignment, assignment_inv, price = state
    b, n, _ = x1.shape
    m = x2.shape[1]
    batch_ix = jnp.arange(b)[:, None]

    if idx is None:
        bid = assignment < 0                       # [B, N] am-I-bidding
        x1w = x1
        j_real = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.int32)[None], (b, n))
    else:
        bid = idx < n                              # [B, W]
        idxc = jnp.minimum(idx, n - 1)
        x1w = jnp.take_along_axis(x1, idxc[..., None], axis=1)
        j_real = jnp.where(bid, idxc, n)

    best, better, best_i = _top2_dispatch(x1w, x2, price, chunk_size)
    bid_inc = best - better + eps  # > 0

    # winner per target among bidders: max increment, ties -> lowest j
    inc_cand = jnp.where(bid, bid_inc, _NEG)
    seg_max = jnp.full((b, m), _NEG).at[batch_ix, best_i].max(inc_cand)
    is_top = bid & (bid_inc >= jnp.take_along_axis(seg_max, best_i, axis=1))
    j_cand = jnp.where(is_top, j_real, n)
    seg_argj = jnp.full((b, m), n, jnp.int32).at[
        batch_ix, best_i].min(j_cand)
    winner = is_top & (j_real == jnp.take_along_axis(seg_argj, best_i,
                                                     axis=1))

    if last:
        # final round: every unassigned point takes its bid target, conflicts
        # allowed (emd_cuda.cu:196-215 with last=true); only `assignment`
        # matters downstream.  (Only reached with idx=None.)
        assignment = jnp.where(bid, best_i, assignment)
        return assignment, assignment_inv, price

    # evict previous owners of contested targets
    prev_owner = jnp.take_along_axis(assignment_inv, best_i, axis=1)  # [B, W]
    evict = winner & (prev_owner >= 0)
    assignment = assignment.at[
        batch_ix, jnp.where(evict, prev_owner, n)].set(-1, mode="drop")
    # assign winners (scatter through the real point ids)
    assignment = assignment.at[
        batch_ix, jnp.where(winner, j_real, n)].set(best_i, mode="drop")
    assignment_inv = assignment_inv.at[
        batch_ix, jnp.where(winner, best_i, m)].set(j_real, mode="drop")
    price = price.at[
        batch_ix, jnp.where(winner, best_i, m)].add(
        jnp.where(winner, bid_inc, 0.0), mode="drop")
    return assignment, assignment_inv, price


def _assignment_from_inv(inv, n):
    """Derive the point->target assignment from the target->owner map (the
    window kernel's only bookkeeping; bijective on its >= 0 entries)."""
    b, m = inv.shape
    bix = jnp.arange(b)[:, None]
    k_ids = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32)[None], (b, m))
    return jnp.full((b, n), -1, jnp.int32).at[
        bix, jnp.where(inv >= 0, inv, n)].set(k_ids, mode="drop")


def _window_tail(x1, x2, eps, rounds, state, iters):
    """Fused-window convergence tail (TPU): repeat {compact once, run up to
    _WINDOW_ROUNDS rounds in one pallas call} until converged or the round
    budget is out.  Bidders assigned mid-window stop bidding inside the
    kernel; points evicted by out-of-window owners re-enter at the next
    window's compaction (any-subset bidding preserves auction convergence,
    same argument as the staged-width compaction above)."""
    from cloud_transformers_tpu.ops.pallas_emd import (
        _window_m_tile, pack_col, pack_targets, pallas_auction_window,
        unpack_col)

    b, n, _ = x1.shape
    m = x2.shape[1]
    w = _WINDOW_W
    m_tile = _window_m_tile(w, m)
    x2b = pack_targets(x2, m_tile)
    assignment, inv, price = state
    prb = pack_col(price, m_tile)
    invb = pack_col(inv, m_tile, fill=-1)

    def unassigned(invb):
        inv = unpack_col(invb, m)
        return n - jnp.sum((inv >= 0).astype(jnp.int32), axis=1)

    def cond(c):
        rounds, prb, invb = c
        return (rounds < iters - 1) & (jnp.max(unassigned(invb)) > 0)

    def body(c):
        rounds, prb, invb = c
        assignment = _assignment_from_inv(unpack_col(invb, m), n)
        idx = _compact_unassigned(assignment, w)
        j_real = jnp.where(idx < n, idx, n).astype(jnp.int32)
        x1w = jnp.take_along_axis(
            x1, jnp.minimum(idx, n - 1)[..., None], axis=1)
        prb2, invb2, used = pallas_auction_window(
            x1w, j_real, x2b, prb, invb, iters - 1 - rounds, eps, n=n,
            rounds_cap=_WINDOW_ROUNDS, interpret=_WINDOW_INTERPRET)
        return rounds + jnp.max(used), prb2, invb2

    rounds, prb, invb = jax.lax.while_loop(cond, body, (rounds, prb, invb))
    inv = unpack_col(invb, m)
    price = unpack_col(prb, m)
    return rounds, (_assignment_from_inv(inv, n), inv, price)


@partial(jax.jit, static_argnames=("iters", "chunk_size"))
def emd_auction_with_rounds(xyz1, xyz2, eps=0.005, iters=50,
                            chunk_size=2048):
    """``emd_auction`` that also reports the auction rounds actually used
    (the while_loop exits early once every point is assigned) — the
    instrumentation behind tools/emd_protocol_cost.py."""
    assert xyz1.shape == xyz2.shape, "EMD requires equal-size clouds"
    b, n, _ = xyz1.shape
    x1 = jax.lax.stop_gradient(xyz1.astype(jnp.float32))
    x2 = jax.lax.stop_gradient(xyz2.astype(jnp.float32))

    state = (jnp.full((b, n), -1, jnp.int32),
             jnp.full((b, n), -1, jnp.int32),
             jnp.zeros((b, n), jnp.float32))

    rounds = jnp.int32(0)
    if iters > 1:
        # Staged-width while_loops with convergence predicates: once every
        # point is assigned no bid can change the state, so exit early — the
        # eval protocol's 3000-round budget (train_inpainter.py:267-269)
        # then costs only as many rounds as the auction actually needs.
        # Width schedule: full-width rounds while many points bid, then
        # cap-compacted rounds (N/8, N/64) for the long convergence tail,
        # cutting the per-round bid search by the same factor.
        # finer width steps cost nothing when convergence skips them (each
        # phase exits immediately once unassigned <= the next cap) and cut
        # the per-round bid search whenever it doesn't
        caps = [c for c in (n // 8, n // 16, n // 32, n // 64) if c >= 256]
        # At protocol scale the convergence tail (unassigned <= 2 * W) runs
        # as fused multi-round Pallas windows on TPU; the per-round XLA
        # compaction phases keep the pre-tail work and every non-TPU run.
        use_window = _WINDOW_TAIL and n >= _WINDOW_MIN_N
        if use_window:
            head_caps = [c for c in caps if c > 2 * _WINDOW_W]
            widths = [None] + head_caps
            exits = head_caps + [2 * _WINDOW_W]
        else:
            widths = [None] + caps
            exits = caps + [0]

        def max_unassigned(s):
            return jnp.max(jnp.sum((s[0] < 0).astype(jnp.int32), axis=1))

        def phase(carry, cap, until):
            def cond(c):
                i, s = c
                return (i < iters - 1) & (max_unassigned(s) > until)

            def body(c):
                i, s = c
                idx = (None if cap is None
                       else _compact_unassigned(s[0], cap))
                return i + 1, _auction_round(x1, x2, eps, chunk_size, s,
                                             last=False, idx=idx)

            return jax.lax.while_loop(cond, body, carry)

        carry = (jnp.int32(0), state)
        for cap, until in zip(widths, exits):
            carry = phase(carry, cap, until)
        rounds, state = carry

        if use_window:
            tail_caps = [c for c in caps if c <= 2 * _WINDOW_W] or [256]

            def xla_tail(rounds, state):
                carry = (rounds, state)
                for cap, until in zip(tail_caps, tail_caps[1:] + [0]):
                    carry = phase(carry, cap, until)
                return carry

            def tpu_tail(rounds, state):
                return _window_tail(x1, x2, eps, rounds, state, iters)

            if _WINDOW_INTERPRET:
                rounds, state = tpu_tail(rounds, state)
            else:
                rounds, state = jax.lax.platform_dependent(
                    rounds, state, tpu=tpu_tail, default=xla_tail)
    state = _auction_round(x1, x2, eps, chunk_size, state, last=True)
    assignment = state[0]

    matched = jnp.take_along_axis(x2, assignment[..., None], axis=1)
    dist = jnp.sum((xyz1 - jax.lax.stop_gradient(matched)) ** 2, axis=-1)
    return dist, assignment, rounds + 1


@partial(jax.jit, static_argnames=("iters", "chunk_size"))
def emd_auction(xyz1, xyz2, eps=0.005, iters=50, chunk_size=2048):
    """Auction-assignment EMD.

    Args:
      xyz1: [B, N, 3] predicted cloud (receives gradient).
      xyz2: [B, N, 3] ground-truth cloud (no gradient, as in the reference).
      eps: bid increment slack (speed/accuracy tradeoff).
      iters: number of auction rounds (static).
      chunk_size: target-dimension tile for the bid search.

    Returns:
      dist: [B, N] squared distances to the matched point (differentiable in
        xyz1 through the fixed assignment).
      assignment: [B, N] int32 matched index into xyz2.
    """
    dist, assignment, _ = emd_auction_with_rounds(xyz1, xyz2, eps, iters,
                                                  chunk_size)
    return dist, assignment


def loss_emd(pred, gt, eps=0.005, iters=50, chunk_size=2048):
    """mean(sqrt(dist)) as used by the completion trainer
    (/root/reference/train_inpainter.py:187-189)."""
    dist, _ = emd_auction(pred, gt, eps, iters, chunk_size)
    return jnp.mean(jnp.sqrt(dist + 1e-12))
