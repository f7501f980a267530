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

    x1_ref  [1, 8, W_t]          rows 0-2 coords, row 3 |x1|^2
    x2_ref  [1, m_tiles, 256, 8] lanes 0-2 coords, lane 3 |x2|^2
    pr_ref  [1, m_tiles, 256, 8] price in lane 0
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
            precision=jax.lax.Precision.HIGHEST)        # [256, W_t]
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
    # target blocks [m_tiles, 256, 8]: lanes 0-2 coords, lane 3 |x2|^2
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
