"""Pallas TPU kernel: the auction's per-round bid search (fused top-2).

One auction round's hot op is, for W bidders against M targets,

    value[j, k] = 3 - ||x1[j] - x2[k]|| - price[k]
    -> per bidder j: (best, second-best, argmax over k)

(reference Bid kernel, /root/reference/emd_linear/emd_cuda.cu:95-179).  The
XLA implementation (losses/emd.py `_top2_values`) is a lax.scan over target
chunks — efficient for FULL-width rounds (the cross term rides one MXU
einsum per chunk), but the eval protocol's 3000-round convergence tail runs
at compacted widths (W = N/8, N/64; losses/emd.py staged compaction) where
the per-round cost is dominated by the scan's fixed op-dispatch overhead,
not arithmetic: measured ~2 ms/round at W=256, M=16384 against ~0.4 ms of
actual vector work.

This kernel fuses the whole bid search into ONE op per round: targets
stream through VMEM in m_tile-row tiles ([m_tile, W] value blocks with
bidders in lanes; m_tile is 256 at full width and up to 2048 at compacted
widths — ``_pick_m_tile``), the cross term is one [m_tile, 3] @ [3, W] MXU
matmul per tile, and the running (best, better, argmax) state lives in
VMEM scratch.  Tie
semantics match the XLA path exactly: global first-occurrence argmax
(within a tile the lowest target index wins; across tiles strictly-greater
keeps the earlier tile).

Measured on v5e (B=8, M=16384): 1.9x over the XLA scan at full width
(47.8 -> 25.1 ms/round), 1.5x at W=2048; below W=1024 the XLA einsum wins
and losses/emd.py dispatches there instead (_PALLAS_BID_MIN_WIDTH).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9          # must match losses/emd.py
_BIG_J = np.int32(2**30)   # "no bidder" sentinel in per-target argmin-j
W_TILE = 256


def _pick_m_tile(w_pad):
    """Target-tile height.  The in-kernel M loop carries the running top-2
    state, so its per-iteration fixed costs (state merge, MXU latency)
    serialize; at small W they dominate — amortize them with taller tiles.
    Measured on v5e (B=8, M=16384): W=256 went 1.95 -> sub-XLA with 2048-
    tall tiles; at large W the [m_tile, W] value block would blow VMEM, so
    stay at 256."""
    if w_pad <= 512:
        return 2048
    if w_pad <= 1024:
        return 1024
    return 256


def _top2_kernel(x1_ref, x2_ref, pr_ref, best_ref, better_ref, idx_ref,
                 best_s, better_s, idx_s, *, m_tiles, m_tile, w_tile):
    """Grid (B, W/W_TILE); in-kernel loop over M_TILE target tiles.

    x1_ref  [1, 8, W_t]              rows 0-2 coords, row 3 |x1|^2
    x2_ref  [1, m_tiles, m_tile, 8]  lanes 0-2 coords, lane 3 |x2|^2
    pr_ref  [1, m_tiles, m_tile, 8]  price in lane 0

    m_tile is shape-dependent (``_pick_m_tile``): 256 at full width, up
    to 2048 at compacted widths.
    """
    neg = jnp.float32(_NEG)
    best_s[:] = jnp.full_like(best_s, neg)
    better_s[:] = jnp.full_like(better_s, neg)
    idx_s[:] = jnp.zeros_like(idx_s)
    x1c = x1_ref[0, 0:3, :]                     # [3, W_t]
    x1sq = x1_ref[0, 3:4, :]                    # [1, W_t]
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (m_tile, w_tile), 0)

    def tile_body(t, _):
        x2r = x2_ref[0, t]                      # [m_tile, 8]
        cross = jax.lax.dot_general(
            x2r[:, 0:3], x1c, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)        # [m_tile, W_t]
        d2 = x1sq + x2r[:, 3:4] - 2.0 * cross
        value = (3.0 - jnp.sqrt(jnp.maximum(d2, 0.0))
                 - pr_ref[0, t, :, 0:1])
        m1 = jnp.max(value, axis=0, keepdims=True)      # [1, W_t]
        hit = value >= m1
        idx_t = jnp.min(jnp.where(hit, sub_iota, m_tile), axis=0,
                        keepdims=True)                  # [1, W_t]
        masked = jnp.where(sub_iota == idx_t, neg, value)
        m2 = jnp.max(masked, axis=0, keepdims=True)

        best = best_s[0:1, :]
        better = better_s[0:1, :]
        bidx = idx_s[0:1, :]
        best_s[0:1, :] = jnp.maximum(best, m1)
        better_s[0:1, :] = jnp.maximum(jnp.minimum(best, m1),
                                       jnp.maximum(better, m2))
        idx_s[0:1, :] = jnp.where(m1 > best, t * m_tile + idx_t, bidx)
        return 0

    jax.lax.fori_loop(0, m_tiles, tile_body, 0)
    # outputs carry an 8-row sublane dim (Mosaic block constraint); row 0
    # is the payload
    best_ref[0, :, :] = best_s[:]
    better_ref[0, :, :] = better_s[:]
    idx_ref[0, :, :] = idx_s[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_top2(x1, x2, price, interpret=False):
    """Fused bid search: (best, better, best_i) per bidder.

    Args:
      x1: [B, W, 3] bidder coords.
      x2: [B, M, 3] target coords.
      price: [B, M] current auction prices.

    Returns:
      best, better [B, W] f32; best_i [B, W] int32 — identical semantics to
      losses/emd.py `_top2_values` (first-occurrence argmax on ties).
    """
    b, w, _ = x1.shape
    m = x2.shape[1]
    w_pad = -(-w // W_TILE) * W_TILE
    m_tile = _pick_m_tile(w_pad)
    m_pad = -(-m // m_tile) * m_tile
    if w_pad != w:
        x1 = jnp.pad(x1, ((0, 0), (0, w_pad - w), (0, 0)))
    if m_pad != m:
        # far-away dummy targets: value ~ -1e6, never in the top-2 of any
        # real target set (same padding the XLA scan uses)
        x2 = jnp.pad(x2, ((0, 0), (0, m_pad - m), (0, 0)),
                     constant_values=1e6)
        price = jnp.pad(price, ((0, 0), (0, m_pad - m)))
    m_tiles = m_pad // m_tile

    # x1 payload [B, 8, W]: rows 0-2 coords, row 3 |x1|^2
    x1t = jnp.swapaxes(x1, 1, 2)                          # [B, 3, W]
    x1p = jnp.concatenate(
        [x1t, jnp.sum(x1t * x1t, axis=1, keepdims=True),
         jnp.zeros((b, 4, w_pad), jnp.float32)], axis=1)  # [B, 8, W]
    # target blocks [m_tiles, m_tile, 8]: lanes 0-2 coords, lane 3 |x2|^2
    # (B-invariant only when all batch rows share x2 — they don't, so keep
    # the batch dim and let the grid index it)
    x2sq = jnp.sum(x2 * x2, axis=-1, keepdims=True)
    x2b = jnp.concatenate(
        [x2, x2sq, jnp.zeros((b, m_pad, 4), jnp.float32)],
        axis=-1).reshape(b, m_tiles, m_tile, 8)
    prb = jnp.pad(price[..., None],
                  ((0, 0), (0, 0), (0, 7))).reshape(b, m_tiles, m_tile, 8)

    kernel = functools.partial(_top2_kernel, m_tiles=m_tiles,
                               m_tile=m_tile, w_tile=W_TILE)
    grid = (b, w_pad // W_TILE)
    best, better, best_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8, W_TILE), lambda bi, wi: (bi, 0, wi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_tiles, m_tile, 8),
                         lambda bi, wi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_tiles, m_tile, 8),
                         lambda bi, wi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 8, W_TILE), lambda bi, wi: (bi, 0, wi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, W_TILE), lambda bi, wi: (bi, 0, wi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, W_TILE), lambda bi, wi: (bi, 0, wi),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 8, w_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, 8, w_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, 8, w_pad), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((8, W_TILE), jnp.float32),
                        pltpu.VMEM((8, W_TILE), jnp.float32),
                        pltpu.VMEM((8, W_TILE), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x1p, jnp.asarray(x2b), prb)
    return best[:, 0, :w], better[:, 0, :w], best_i[:, 0, :w]


# ---------------------------------------------------------------------------
# Fused multi-round auction window
#
# The 3000-round eval-protocol tail (train_inpainter.py:267-269) runs at
# compacted widths where each round's arithmetic is tiny but each round is a
# separate dispatch: measured ~1.7 ms/round fixed cost on the tunnel runtime
# (ROADMAP round-4 table), i.e. the tail's wall time is dispatch, not math.
# This kernel runs up to ``rounds_cap`` WHOLE auction rounds in ONE pallas
# call, with the price and owner (assignment-inverse) state resident in VMEM
# across rounds.
#
# Per-round structure (one program per batch row, W bidders in lanes):
#   phase 1  bid search: the same streamed [m_tile, W] top-2 pass as
#            ``pallas_top2`` above (targets in sublanes, one [m_tile,3]@[3,W]
#            MXU matmul per tile).
#   phase 2  conflict resolution + state update, fully vectorized: targets
#            are PARTITIONED across tiles, so for any target its winner
#            (max bid increment, ties -> lowest original bidder id,
#            emd_cuda.cu:181-194) is decided entirely within its tile's
#            [m_tile, W] one-hot block — no scatters, no scalar addressing.
#            The same pass applies the price bump, swaps the owner, and
#            flags in-window evictions back into the bidder mask.
#
# Window semantics (vs losses/emd.py's per-round XLA compaction): the bidder
# set is FIXED for the window; bidders assigned mid-window stop bidding
# (local mask), in-window evicted bidders resume, and points evicted whose
# owner is OUTSIDE the window simply wait for the next window's compaction —
# any-subset bidding keeps auction convergence (prices are monotone).  The
# full assignment array is NOT kernel state: it is derived outside from the
# owner map (assignment = inverse of inv on its >= 0 entries).
# ---------------------------------------------------------------------------


def _window_m_tile(w_pad, m):
    """Target-tile height for the window kernel: keep the [m_tile, W] value
    block at 2 MB so taller tiles amortize the in-kernel loop's fixed costs
    at the narrow widths the convergence tail runs at; never taller than the
    (256-padded) target count itself."""
    cap = max(256, (2 * 1024 * 1024 // 4) // w_pad)
    return min(cap, -(-m // 256) * 256)


def pack_targets(x2, m_tile):
    """[B, M, 3] -> [B, m_tiles, m_tile, 8] blocks (coords + |x2|^2), padded
    with far-away dummy targets no bidder can ever pick."""
    b, m, _ = x2.shape
    m_pad = -(-m // m_tile) * m_tile
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, 0), (0, m_pad - m), (0, 0)),
                     constant_values=1e6)
    x2sq = jnp.sum(x2 * x2, axis=-1, keepdims=True)
    return jnp.concatenate(
        [x2, x2sq, jnp.zeros((b, m_pad, 4), jnp.float32)],
        axis=-1).reshape(b, m_pad // m_tile, m_tile, 8)


def pack_col(v, m_tile, fill=0):
    """[B, M] scalar-per-target state -> [B, m_tiles, m_tile, 8] blocks with
    the payload in lane 0 (Mosaic block layout; lanes 1-7 padding)."""
    b, m = v.shape
    m_pad = -(-m // m_tile) * m_tile
    if m_pad != m:
        v = jnp.pad(v, ((0, 0), (0, m_pad - m)), constant_values=fill)
    return jnp.pad(v[..., None], ((0, 0), (0, 0), (0, 7))).reshape(
        b, m_pad // m_tile, m_tile, 8)


def unpack_col(blocks, m):
    """Inverse of ``pack_col``: [B, m_tiles, m_tile, 8] -> [B, M]."""
    b = blocks.shape[0]
    return blocks[..., 0].reshape(b, -1)[:, :m]


def _auction_window_kernel(rem_ref, eps_ref, x1p_ref, jr_ref, x2_ref,
                           pr_in, inv_in, pr_ref, inv_ref, rounds_ref, la_s,
                           *, n, m_tiles, m_tile, w_pad, rounds_cap):
    """One batch row's window: up to ``rounds_cap`` rounds, early exit when
    every window bidder is assigned or the round budget is spent.

    rem_ref SMEM [1, 1] i32: remaining protocol round budget.
    eps_ref SMEM [1, 1] f32: bid increment slack.
    """
    neg = jnp.float32(_NEG)
    pr_ref[:] = pr_in[:]
    inv_ref[:] = inv_in[:]
    la_s[:] = jnp.full_like(la_s, -1)

    x1c = x1p_ref[0, 0:3, :]                     # [3, W]
    x1sq = x1p_ref[0, 3:4, :]                    # [1, W]
    jrow = jr_ref[0, 0:1, :]                     # [1, W] original point ids
    valid = jrow < n
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (m_tile, w_pad), 0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (m_tile, 1), 0)
    rem = rem_ref[0, 0]
    eps = eps_ref[0, 0]

    def round_body(r, carry):
        done, used = carry
        run = jnp.logical_not(done) & (r < rem)

        @pl.when(run)
        def _():
            la = la_s[0:1, :]
            active = (la < 0) & valid

            def bid_tile(t, c):
                best, better, bidx = c
                x2r = x2_ref[0, t]                       # [m_tile, 8]
                cross = jax.lax.dot_general(
                    x2r[:, 0:3], x1c, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                d2 = x1sq + x2r[:, 3:4] - 2.0 * cross
                value = (3.0 - jnp.sqrt(jnp.maximum(d2, 0.0))
                         - pr_ref[0, t, :, 0:1])
                m1 = jnp.max(value, axis=0, keepdims=True)
                hit = value >= m1
                idx_t = jnp.min(jnp.where(hit, sub_iota, m_tile), axis=0,
                                keepdims=True)
                masked = jnp.where(sub_iota == idx_t, neg, value)
                m2 = jnp.max(masked, axis=0, keepdims=True)
                nbi = jnp.where(m1 > best, t * m_tile + idx_t, bidx)
                nbetter = jnp.maximum(jnp.minimum(best, m1),
                                      jnp.maximum(better, m2))
                return jnp.maximum(best, m1), nbetter, nbi

            zero_w = jnp.zeros((1, w_pad), jnp.int32)
            best, better, best_i = jax.lax.fori_loop(
                0, m_tiles, bid_tile,
                (jnp.full((1, w_pad), neg), jnp.full((1, w_pad), neg),
                 zero_w))
            inc = best - better + eps                    # [1, W], > 0

            def resolve_tile(t, c):
                win_lane, ev_lane = c
                m_ids = t * m_tile + col_iota            # [m_tile, 1]
                cont = (best_i == m_ids) & active        # [m_tile, W]
                inc_m = jnp.where(cont, inc, neg)
                seg_max = jnp.max(inc_m, axis=1, keepdims=True)
                is_top = cont & (inc_m >= seg_max)
                jc = jnp.where(is_top, jrow, _BIG_J)
                seg_argj = jnp.min(jc, axis=1, keepdims=True)
                winner_m = is_top & (jrow == seg_argj)
                dp = jnp.max(jnp.where(winner_m, inc, 0.0), axis=1,
                             keepdims=True)
                new_owner = jnp.min(jnp.where(winner_m, jrow, _BIG_J),
                                    axis=1, keepdims=True)
                has_w = new_owner < _BIG_J
                pr_ref[0, t, :, 0:1] = pr_ref[0, t, :, 0:1] + dp
                prev = inv_ref[0, t, :, 0:1]
                inv_ref[0, t, :, 0:1] = jnp.where(has_w, new_owner, prev)
                evicted = jnp.where(has_w & (prev >= 0), prev,
                                    jnp.int32(-1))
                ev_t = jnp.max(
                    ((evicted == jrow) & (evicted >= 0)).astype(jnp.int32),
                    axis=0, keepdims=True)
                win_t = jnp.max(winner_m.astype(jnp.int32), axis=0,
                                keepdims=True)
                return (jnp.maximum(win_lane, win_t),
                        jnp.maximum(ev_lane, ev_t))

            win_lane, ev_lane = jax.lax.fori_loop(
                0, m_tiles, resolve_tile, (zero_w, zero_w))
            la2 = jnp.where(win_lane > 0, best_i, la)
            la_s[0:1, :] = jnp.where(ev_lane > 0, jnp.int32(-1), la2)

        active_now = (la_s[0:1, :] < 0) & valid
        all_done = jnp.sum(active_now.astype(jnp.int32)) == 0
        return (done | all_done | (r + 1 >= rem),
                used + jnp.where(run, 1, 0).astype(jnp.int32))

    start_active = (la_s[0:1, :] < 0) & valid
    done0 = jnp.sum(start_active.astype(jnp.int32)) == 0
    _, used = jax.lax.fori_loop(0, rounds_cap, round_body,
                                (done0, jnp.int32(0)))
    rounds_ref[0, :, :] = jnp.full((8, 128), used, jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("n", "rounds_cap", "interpret"))
def pallas_auction_window(x1w, j_real, x2_blocks, pr_blocks, inv_blocks,
                          rem, eps, *, n, rounds_cap=64, interpret=False):
    """Run up to ``rounds_cap`` auction rounds for a fixed bidder window.

    Args:
      x1w: [B, W, 3] gathered bidder coords (window lanes; pad lanes
        arbitrary — masked by ``j_real``).
      j_real: [B, W] int32 original point id per lane, sentinel ``n`` for
        padding lanes.
      x2_blocks: [B, m_tiles, m_tile, 8] from ``pack_targets``.
      pr_blocks / inv_blocks: price / owner state from ``pack_col``
        (donated: aliased to the outputs).
      rem: scalar int32, remaining protocol round budget (dynamic).
      eps: scalar f32 bid slack (dynamic).
      n: bidder universe size (static; the j sentinel).
      rounds_cap: static max rounds this call may run.

    Returns:
      (pr_blocks', inv_blocks', rounds_used) — rounds_used [B] int32.
    """
    b, w, _ = x1w.shape
    _, m_tiles, m_tile, _ = x2_blocks.shape
    w_pad = -(-w // 128) * 128
    if w_pad != w:
        x1w = jnp.pad(x1w, ((0, 0), (0, w_pad - w), (0, 0)))
        j_real = jnp.pad(j_real, ((0, 0), (0, w_pad - w)),
                         constant_values=n)
    x1t = jnp.swapaxes(x1w, 1, 2)                        # [B, 3, W]
    x1p = jnp.concatenate(
        [x1t, jnp.sum(x1t * x1t, axis=1, keepdims=True),
         jnp.zeros((b, 4, w_pad), jnp.float32)], axis=1)
    jr = jnp.pad(j_real[:, None, :].astype(jnp.int32),
                 ((0, 0), (0, 7), (0, 0)), constant_values=n)
    rem_arr = jnp.asarray(rem, jnp.int32).reshape(1, 1)
    eps_arr = jnp.asarray(eps, jnp.float32).reshape(1, 1)

    kernel = functools.partial(
        _auction_window_kernel, n=n, m_tiles=m_tiles, m_tile=m_tile,
        w_pad=w_pad, rounds_cap=rounds_cap)
    blk = (1, m_tiles, m_tile, 8)
    blk_spec = pl.BlockSpec(blk, lambda bi: (bi, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, 8, w_pad), lambda bi: (bi, 0, 0),
                            memory_space=pltpu.VMEM)
    pr_out, inv_out, rounds = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda bi: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda bi: (0, 0),
                         memory_space=pltpu.SMEM),
            row_spec, row_spec, blk_spec, blk_spec, blk_spec,
        ],
        out_specs=(blk_spec, blk_spec,
                   pl.BlockSpec((1, 8, 128), lambda bi: (bi, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(
            jax.ShapeDtypeStruct(pr_blocks.shape, jnp.float32),
            jax.ShapeDtypeStruct(inv_blocks.shape, jnp.int32),
            jax.ShapeDtypeStruct((b, 8, 128), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((8, w_pad), jnp.int32)],
        input_output_aliases={5: 0, 6: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(rem_arr, eps_arr, x1p, jr, x2_blocks,
      pr_blocks.astype(jnp.float32), inv_blocks.astype(jnp.int32))
    return pr_out, inv_out, rounds[:, 0, 0]
