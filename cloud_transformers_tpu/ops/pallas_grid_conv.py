"""Pallas TPU kernel: grouped 3x3(x3) grid convolution in the KERNEL layout.

The MHCT hot loop is splat -> grouped conv -> slice (reference
/root/reference/layers/multihead_ct.py:50-65, 107).  The splat/slice Pallas
kernels keep grids in the layout [R=B*H, X*F_pad, lanes] (rows = x*F_pad + f,
lanes = y (2D) or y*Z + z (3D)); the XLA grouped conv wants channel-minor
[B, *spatial, H*F], and the two boundary conversions around every conv
measured 24% of the classifier forward (ROADMAP r3 known-gap #1; per-op
profile: copy 18% + reshape 3.7% + pad 1.6%, convs themselves ~0.03%).

This kernel runs the conv directly in the kernel layout, head-grouped by
construction (grid row r belongs to head r % H, so each r has its own
[F, F] tap kernels):

  out[x] [F_pad, lanes] = sum over taps t=(dy,dz) and dx of
      W[t, dx] @ (lane-rolled, boundary-masked) in[x + dx - 1]

implemented as ONE MXU matmul per x row block against an im2col scratch of
shape [taps*3*F_pad, lanes] built with `pltpu.roll` (the 3x3x3 stencil over
lanes is shift-friendly: a (dy, dz) tap is a lane shift by (dy-1)*Z+(dz-1)
with y/z-wraparound masks).  Boundary x blocks read a zero-padded copy of
the grid.  The backward reuses the same kernel: d_in is the spatially
flipped, (fi,fo)-transposed conv; d_W is an im2col x cotangent contraction
accumulated over the batch members of each head.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cloud_transformers_tpu.ops.pallas_splat import kernel_grid_dims


def _tap_shifts(sizes):
    """Lane shifts + (dy, dz) offsets for each tap (3D: 9 taps, 2D: 3)."""
    if len(sizes) == 3:
        z = sizes[2]
        return [((dy - 1) * z + (dz - 1), dy - 1, dz - 1)
                for dy in range(3) for dz in range(3)]
    return [((dy - 1), dy - 1, None) for dy in range(3)]


def _tap_masks(sizes, lanes, lane_extent):
    """Per-tap validity of the SOURCE lane l + s as a [1, lanes] f32 mask
    (y/z stencil offsets must stay in range; lane-linear shifts wrap across
    z rows and into the 128-lane padding otherwise)."""
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
    if len(sizes) == 3:
        y_dim, z_dim = sizes[1], sizes[2]
        y = lane_ids // z_dim
        z = lane_ids % z_dim
    else:
        y_dim, z_dim = sizes[1], None
        y, z = lane_ids, None
    masks = []
    for _, dy, dz in _tap_shifts(sizes):
        ok = (y + dy >= 0) & (y + dy < y_dim) & (lane_ids < lane_extent)
        if z is not None:
            ok &= (z + dz >= 0) & (z + dz < z_dim)
        masks.append(ok.astype(jnp.float32))
    return masks, (lane_ids < lane_extent).astype(jnp.float32)


def _grid_conv_kernel(gk_ref, w_ref, b_ref, out_ref, pad_ref, im_ref, *,
                      sizes, x_dim, f_pad, lanes, lane_extent):
    shifts = _tap_shifts(sizes)
    masks, valid_out = _tap_masks(sizes, lanes, lane_extent)
    k3 = len(shifts) * 3 * f_pad

    # zero-padded copy of the grid: one extra row block at each x edge
    pad_ref[0:f_pad, :] = jnp.zeros((f_pad, lanes), jnp.float32)
    pad_ref[pl.ds((x_dim + 1) * f_pad, f_pad), :] = jnp.zeros(
        (f_pad, lanes), jnp.float32)
    pad_ref[pl.ds(f_pad, x_dim * f_pad), :] = gk_ref[0]

    w = w_ref[0]          # [F_pad, K3]
    bias = b_ref[0]       # [F_pad, 1]

    def x_body(x, _):
        x0 = pl.multiple_of(x * f_pad, f_pad)
        slab = pad_ref[pl.ds(x0, 3 * f_pad), :]          # [3F_pad, lanes]
        for t, (s, _, _) in enumerate(shifts):
            rolled = pltpu.roll(slab, (-s) % lanes, axis=1) if s else slab
            im_ref[t * 3 * f_pad:(t + 1) * 3 * f_pad, :] = rolled * masks[t]
        acc = jax.lax.dot_general(
            w, im_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [F_pad, lanes]
        out_ref[0, pl.ds(x0, f_pad), :] = (acc + bias) * valid_out
        return 0

    jax.lax.fori_loop(0, x_dim, x_body, 0)


@functools.partial(jax.jit,
                   static_argnames=("sizes", "feat", "heads", "interpret"))
def pallas_grid_conv(gk, w_mat, b_col, sizes, feat, heads, interpret=False):
    """Grouped 'same' 3x..x3 conv on kernel-layout grids.

    Args:
      gk: [R, X*F_pad, lanes] f32, R = B*heads (head-minor).
      w_mat: [H, F_pad, taps*3*F_pad] f32 — packed per-head tap kernels,
        column order (tap, dx, fi) (see ``pack_w``).
      b_col: [H, F_pad, 1] f32 bias (zero-padded past feat).
      sizes: grid spatial sizes (X, Y) or (X, Y, Z).

    Returns: [R, X*F_pad, lanes] f32, valid lanes masked, pad rows zero.
    """
    r = gk.shape[0]
    x_dim, lane_extent, lanes, f_pad = kernel_grid_dims(sizes, feat)
    k3 = len(_tap_shifts(sizes)) * 3 * f_pad
    h = heads

    kernel = functools.partial(
        _grid_conv_kernel, sizes=tuple(sizes), x_dim=x_dim, f_pad=f_pad,
        lanes=lanes, lane_extent=lane_extent)
    return pl.pallas_call(
        kernel,
        grid=(r,),
        in_specs=[
            pl.BlockSpec((1, x_dim * f_pad, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_pad, k3), lambda i: (i % h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_pad, 1), lambda i: (i % h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, x_dim * f_pad, lanes),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, x_dim * f_pad, lanes),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM(((x_dim + 2) * f_pad, lanes), jnp.float32),
            pltpu.VMEM((k3, lanes), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(gk, w_mat, b_col)


def _grid_conv_dw_kernel(gk_ref, g_ref, dw_ref, pad_ref, im_ref, *,
                         sizes, x_dim, f_pad, lanes, lane_extent):
    shifts = _tap_shifts(sizes)
    masks, valid_out = _tap_masks(sizes, lanes, lane_extent)
    k3 = len(shifts) * 3 * f_pad
    b_idx = pl.program_id(1)

    pad_ref[0:f_pad, :] = jnp.zeros((f_pad, lanes), jnp.float32)
    pad_ref[pl.ds((x_dim + 1) * f_pad, f_pad), :] = jnp.zeros(
        (f_pad, lanes), jnp.float32)
    pad_ref[pl.ds(f_pad, x_dim * f_pad), :] = gk_ref[0]

    def x_body(x, acc):
        x0 = pl.multiple_of(x * f_pad, f_pad)
        slab = pad_ref[pl.ds(x0, 3 * f_pad), :]
        for t, (s, _, _) in enumerate(shifts):
            rolled = pltpu.roll(slab, (-s) % lanes, axis=1) if s else slab
            im_ref[t * 3 * f_pad:(t + 1) * 3 * f_pad, :] = rolled * masks[t]
        gb = g_ref[0, pl.ds(x0, f_pad), :] * valid_out    # [F_pad, lanes]
        return acc + jax.lax.dot_general(
            im_ref[:], gb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # [K3, F_pad]

    total = jax.lax.fori_loop(0, x_dim, x_body,
                              jnp.zeros((k3, f_pad), jnp.float32))

    @pl.when(b_idx == 0)
    def _():
        dw_ref[0] = total

    @pl.when(b_idx > 0)
    def _():
        dw_ref[0] = dw_ref[0] + total


@functools.partial(jax.jit,
                   static_argnames=("sizes", "feat", "heads", "interpret"))
def pallas_grid_conv_dw(gk, g, sizes, feat, heads, interpret=False):
    """Kernel-gradient contraction: dW_mat [H, taps*3*F_pad, F_pad] =
    sum over the head's batch members, x blocks and valid lanes of
    im2col(gk) x cotangent."""
    r = gk.shape[0]
    h = heads
    b = r // h
    x_dim, lane_extent, lanes, f_pad = kernel_grid_dims(sizes, feat)
    k3 = len(_tap_shifts(sizes)) * 3 * f_pad

    kernel = functools.partial(
        _grid_conv_dw_kernel, sizes=tuple(sizes), x_dim=x_dim, f_pad=f_pad,
        lanes=lanes, lane_extent=lane_extent)
    spec_g = pl.BlockSpec((1, x_dim * f_pad, lanes),
                          lambda hi, bi: (bi * h + hi, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(h, b),
        in_specs=[spec_g, spec_g],
        out_specs=pl.BlockSpec((1, k3, f_pad), lambda hi, bi: (hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, k3, f_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM(((x_dim + 2) * f_pad, lanes), jnp.float32),
            pltpu.VMEM((k3, lanes), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(gk, g)


# ---------------------------------------------------------------------------
# 2D variant: block-banded matmuls instead of a per-x-row loop.
#
# The v1 kernel above issues one small matmul per x row — fine on 3D grids
# (lanes = Y*Z is wide, enough work per row) but instruction-issue-bound on
# 2D grids (lanes = Y only; at 128x128/F=4 it lost 2.4x to the XLA conv,
# tools/grid_conv_bench.py).  Here the dx stencil is folded into a
# PRECOMPUTED block-banded matrix M per dy tap:
#
#   M[dy][xb*F_pad + fo, (xb+dx)*F_pad + fi] = W[dx, dy, fi, fo]
#
# so a whole BLK-row tile of output is ONE MXU matmul per tap against a
# contiguous slab of the tap-rolled padded grid:
#
#   out[tile i] = sum_dy M[dy] @ T_dy[i*BLK*F_pad : (i*BLK+BLK+2)*F_pad, :]
#
# where T_dy = lane-rolled, boundary-masked copies of the zero-padded grid,
# built once per batch row (3 full-grid rolls instead of 3*X slab rolls).
# The (BLK+2)/3 MAC overhead of the band zeros is free on the MXU relative
# to the issue-bound loop it replaces.
# ---------------------------------------------------------------------------


def _blk2d(x_dim, f_pad):
    """Largest tile of x rows such that BLK*F_pad <= 128 and BLK | X."""
    b = max(1, min(x_dim, 128 // f_pad))
    while x_dim % b:
        b -= 1
    return b


def _grid_conv2d_kernel(gk_ref, m_ref, b_ref, out_ref, pad_ref, t_ref, *,
                        sizes, x_dim, f_pad, lanes, lane_extent, blk):
    shifts = _tap_shifts(sizes)
    masks, valid_out = _tap_masks(sizes, lanes, lane_extent)

    pad_ref[0:f_pad, :] = jnp.zeros((f_pad, lanes), jnp.float32)
    pad_ref[pl.ds((x_dim + 1) * f_pad, f_pad), :] = jnp.zeros(
        (f_pad, lanes), jnp.float32)
    pad_ref[pl.ds(f_pad, x_dim * f_pad), :] = gk_ref[0]

    for t, (s, _, _) in enumerate(shifts):
        rolled = (pltpu.roll(pad_ref[:], (-s) % lanes, axis=1)
                  if s else pad_ref[:])
        t_ref[t] = rolled * masks[t]

    sbl = (blk + 2) * f_pad
    bias = b_ref[0]                                   # [BLK*F_pad, 1]
    for i in range(x_dim // blk):
        x0 = i * blk * f_pad
        acc = jnp.zeros((blk * f_pad, lanes), jnp.float32)
        for t in range(len(shifts)):
            acc += jax.lax.dot_general(
                m_ref[0, t], t_ref[t, pl.ds(x0, sbl), :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[0, pl.ds(x0, blk * f_pad), :] = (acc + bias) * valid_out


@functools.partial(jax.jit,
                   static_argnames=("sizes", "feat", "heads", "interpret"))
def pallas_grid_conv2d(gk, m_mats, b_tile, sizes, feat, heads,
                       interpret=False):
    """Banded grouped 'same' 3x3 conv on 2D kernel-layout grids.

    Args:
      gk: [R, X*F_pad, lanes] f32, R = B*heads (head-minor).
      m_mats: [H, 3, BLK*F_pad, (BLK+2)*F_pad] banded tap matrices
        (``pack_m2d``).
      b_tile: [H, BLK*F_pad, 1] bias tiled per x row block.
    """
    r = gk.shape[0]
    x_dim, lane_extent, lanes, f_pad = kernel_grid_dims(sizes, feat)
    blk = _blk2d(x_dim, f_pad)
    sbl = (blk + 2) * f_pad
    h = heads

    kernel = functools.partial(
        _grid_conv2d_kernel, sizes=tuple(sizes), x_dim=x_dim, f_pad=f_pad,
        lanes=lanes, lane_extent=lane_extent, blk=blk)
    return pl.pallas_call(
        kernel,
        grid=(r,),
        in_specs=[
            pl.BlockSpec((1, x_dim * f_pad, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, blk * f_pad, sbl),
                         lambda i: (i % h, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk * f_pad, 1), lambda i: (i % h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, x_dim * f_pad, lanes),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, x_dim * f_pad, lanes),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM(((x_dim + 2) * f_pad, lanes), jnp.float32),
            pltpu.VMEM((3, (x_dim + 2) * f_pad, lanes), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(gk, m_mats, b_tile)


def _grid_conv2d_dm_kernel(gk_ref, g_ref, dm_ref, pad_ref, t_ref, *,
                           sizes, x_dim, f_pad, lanes, lane_extent, blk):
    shifts = _tap_shifts(sizes)
    masks, valid_out = _tap_masks(sizes, lanes, lane_extent)
    b_idx = pl.program_id(1)
    sbl = (blk + 2) * f_pad

    pad_ref[0:f_pad, :] = jnp.zeros((f_pad, lanes), jnp.float32)
    pad_ref[pl.ds((x_dim + 1) * f_pad, f_pad), :] = jnp.zeros(
        (f_pad, lanes), jnp.float32)
    pad_ref[pl.ds(f_pad, x_dim * f_pad), :] = gk_ref[0]
    for t, (s, _, _) in enumerate(shifts):
        rolled = (pltpu.roll(pad_ref[:], (-s) % lanes, axis=1)
                  if s else pad_ref[:])
        t_ref[t] = rolled * masks[t]

    accs = [jnp.zeros((blk * f_pad, sbl), jnp.float32)
            for _ in range(len(shifts))]
    for i in range(x_dim // blk):
        x0 = i * blk * f_pad
        g_blk = g_ref[0, pl.ds(x0, blk * f_pad), :] * valid_out
        for t in range(len(shifts)):
            accs[t] += jax.lax.dot_general(
                g_blk, t_ref[t, pl.ds(x0, sbl), :],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

    for t in range(len(shifts)):
        @pl.when(b_idx == 0)
        def _(t=t):
            dm_ref[0, t] = accs[t]

        @pl.when(b_idx > 0)
        def _(t=t):
            dm_ref[0, t] = dm_ref[0, t] + accs[t]


@functools.partial(jax.jit,
                   static_argnames=("sizes", "feat", "heads", "interpret"))
def pallas_grid_conv2d_dm(gk, g, sizes, feat, heads, interpret=False):
    """Banded-matrix gradient: dM [H, 3, BLK*F_pad, (BLK+2)*F_pad] =
    sum over the head's batch members and x tiles of
    (masked cotangent tile) x (tap slab)^T; fold to the param layout with
    ``unpack_dm2d``."""
    r = gk.shape[0]
    h = heads
    b = r // h
    x_dim, lane_extent, lanes, f_pad = kernel_grid_dims(sizes, feat)
    blk = _blk2d(x_dim, f_pad)
    sbl = (blk + 2) * f_pad

    kernel = functools.partial(
        _grid_conv2d_dm_kernel, sizes=tuple(sizes), x_dim=x_dim,
        f_pad=f_pad, lanes=lanes, lane_extent=lane_extent, blk=blk)
    spec_g = pl.BlockSpec((1, x_dim * f_pad, lanes),
                          lambda hi, bi: (bi * h + hi, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(h, b),
        in_specs=[spec_g, spec_g],
        out_specs=pl.BlockSpec((1, 3, blk * f_pad, sbl),
                               lambda hi, bi: (hi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, 3, blk * f_pad, sbl),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM(((x_dim + 2) * f_pad, lanes), jnp.float32),
            pltpu.VMEM((3, (x_dim + 2) * f_pad, lanes), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(gk, g)


def pack_m2d(kernel, feat, heads, sizes):
    """[3, 3, F, H*F] -> banded M [H, 3(dy), BLK*F_pad, (BLK+2)*F_pad]:
    M[h, dy, xb*F_pad+fo, (xb+dx)*F_pad+fi] = kernel[dx, dy, fi, h*F+fo]."""
    x_dim, _, _, f_pad = kernel_grid_dims(sizes, feat)
    blk = _blk2d(x_dim, f_pad)
    f, h = feat, heads
    km = kernel.reshape(3, 3, f, h, f)              # [dx, dy, fi, h, fo]
    m = jnp.zeros((h, 3, blk * f_pad, (blk + 2) * f_pad), kernel.dtype)
    for dx in range(3):
        blk_w = km[dx].transpose(2, 0, 3, 1)        # [h, dy, fo, fi]
        for xb in range(blk):
            m = m.at[:, :, xb * f_pad:xb * f_pad + f,
                     (xb + dx) * f_pad:(xb + dx) * f_pad + f].set(blk_w)
    return m


def pack_m2d_transposed(kernel, feat, heads, sizes):
    """Banded M of the TRANSPOSED conv (d_input backward): spatially
    flipped, (fi, fo) roles swapped."""
    f, h = feat, heads
    km = kernel.reshape(3, 3, f, h, f)[::-1, ::-1]  # flip dx, dy
    kt = km.transpose(0, 1, 4, 3, 2).reshape(3, 3, f, h * f)
    return pack_m2d(kt, feat, heads, sizes)


def unpack_dm2d(dm, feat, heads, sizes):
    """Fold the band diagonals of dM back to the param layout
    [3, 3, F, H*F]."""
    x_dim, _, _, f_pad = kernel_grid_dims(sizes, feat)
    blk = _blk2d(x_dim, f_pad)
    f, h = feat, heads
    dm6 = dm.reshape(h, 3, blk, f_pad, blk + 2, f_pad)
    out = jnp.zeros((3, 3, f, h, f), dm.dtype)
    for dx in range(3):
        acc = 0
        for xb in range(blk):
            acc = acc + dm6[:, :, xb, :f, xb + dx, :f]  # [h, dy, fo, fi]
        out = out.at[dx].set(acc.transpose(1, 3, 0, 2))  # [dy, fi, h, fo]
    return out.reshape(3, 3, f, h * f)


def pack_b2d(bias, feat, heads, sizes):
    """[H*F] -> [H, BLK*F_pad, 1] (bias tiled per x row block)."""
    x_dim, _, _, f_pad = kernel_grid_dims(sizes, feat)
    blk = _blk2d(x_dim, f_pad)
    b = pack_b(bias, feat, heads, sizes)            # [H, F_pad, 1]
    return jnp.tile(b, (1, blk, 1))


# ---------------------------------------------------------------------------
# Weight packing between the flax param layout (grouped HWIO / DHWIO:
# [*k, F_in, H*F_out], bias [H*F_out]) and the kernel's matrix layout.
# ---------------------------------------------------------------------------

def pack_w(kernel, feat, heads, sizes):
    """[*k, F, H*F] -> [H, F_pad, taps*3*F_pad], columns (tap, dx, fi)."""
    dim = len(sizes)
    _, _, _, f_pad = kernel_grid_dims(sizes, feat)
    f = feat
    h = heads
    if dim == 3:
        km = kernel.reshape(3, 3, 3, f, h, f)           # [dx,dy,dz,fi,h,fo]
        km = jnp.pad(km, ((0, 0),) * 3
                     + ((0, f_pad - f), (0, 0), (0, 0)))
        w = km.transpose(4, 5, 1, 2, 0, 3)              # [h,fo,dy,dz,dx,fi]
        w = w.reshape(h, f, 9 * 3 * f_pad)
    else:
        km = kernel.reshape(3, 3, f, h, f)              # [dx,dy,fi,h,fo]
        km = jnp.pad(km, ((0, 0),) * 2 + ((0, f_pad - f), (0, 0), (0, 0)))
        w = km.transpose(3, 4, 1, 0, 2)                 # [h,fo,dy,dx,fi]
        w = w.reshape(h, f, 3 * 3 * f_pad)
    return jnp.pad(w, ((0, 0), (0, f_pad - f), (0, 0)))


def pack_w_transposed(kernel, feat, heads, sizes):
    """Packed weights of the TRANSPOSED conv (the d_input backward):
    spatially flipped, (fi, fo) roles swapped."""
    dim = len(sizes)
    f, h = feat, heads
    if dim == 3:
        km = kernel.reshape(3, 3, 3, f, h, f)[::-1, ::-1, ::-1]
        # want wT[h, fi, (dy', dz', dx', fo_pad)]
        km = jnp.pad(km, ((0, 0),) * 3 + ((0, 0), (0, 0), (0, 0)))
        _, _, _, f_pad = kernel_grid_dims(sizes, feat)
        km = jnp.pad(km, ((0, 0),) * 3 + ((0, 0), (0, 0), (0, f_pad - f)))
        w = km.transpose(4, 3, 1, 2, 0, 5)              # [h,fi,dy,dz,dx,fo]
        w = w.reshape(h, f, 9 * 3 * f_pad)
    else:
        km = kernel.reshape(3, 3, f, h, f)[::-1, ::-1]
        _, _, _, f_pad = kernel_grid_dims(sizes, feat)
        km = jnp.pad(km, ((0, 0),) * 2 + ((0, 0), (0, 0), (0, f_pad - f)))
        w = km.transpose(3, 2, 1, 0, 4)                 # [h,fi,dy,dx,fo]
        w = w.reshape(h, f, 3 * 3 * f_pad)
    return jnp.pad(w, ((0, 0), (0, f_pad - f), (0, 0)))


def unpack_dw(dw_mat, feat, heads, sizes):
    """[H, taps*3*F_pad, F_pad] -> kernel-grad in the param layout
    [*k, F, H*F]."""
    dim = len(sizes)
    f, h = feat, heads
    _, _, _, f_pad = kernel_grid_dims(sizes, feat)
    if dim == 3:
        d = dw_mat.reshape(h, 3, 3, 3, f_pad, f_pad)    # [h,dy,dz,dx,fi,fo]
        d = d[:, :, :, :, :f, :f]
        d = d.transpose(3, 1, 2, 4, 0, 5)               # [dx,dy,dz,fi,h,fo]
        return d.reshape(3, 3, 3, f, h * f)
    d = dw_mat.reshape(h, 3, 3, f_pad, f_pad)           # [h,dy,dx,fi,fo]
    d = d[:, :, :, :f, :f]
    d = d.transpose(2, 1, 3, 0, 4)                      # [dx,dy,fi,h,fo]
    return d.reshape(3, 3, f, h * f)


def pack_b(bias, feat, heads, sizes):
    """[H*F] -> [H, F_pad, 1] (zero-padded)."""
    _, _, _, f_pad = kernel_grid_dims(sizes, feat)
    b = bias.reshape(heads, feat, 1)
    return jnp.pad(b, ((0, 0), (0, f_pad - feat), (0, 0)))


# ---------------------------------------------------------------------------
# custom_vjp wrapper with per-platform dispatch (interpret mode off-TPU)
# ---------------------------------------------------------------------------

def _dispatch_conv(gk, w_mat, b_col, sizes, feat, heads):
    return jax.lax.platform_dependent(
        gk, w_mat, b_col,
        tpu=lambda *a: pallas_grid_conv(*a, sizes, feat, heads),
        default=lambda *a: pallas_grid_conv(*a, sizes, feat, heads,
                                            interpret=True),
    )


def _dispatch_dw(gk, g, sizes, feat, heads):
    return jax.lax.platform_dependent(
        gk, g,
        tpu=lambda *a: pallas_grid_conv_dw(*a, sizes, feat, heads),
        default=lambda *a: pallas_grid_conv_dw(*a, sizes, feat, heads,
                                               interpret=True),
    )


def _dispatch_conv2d(gk, m_mats, b_tile, sizes, feat, heads):
    return jax.lax.platform_dependent(
        gk, m_mats, b_tile,
        tpu=lambda *a: pallas_grid_conv2d(*a, sizes, feat, heads),
        default=lambda *a: pallas_grid_conv2d(*a, sizes, feat, heads,
                                              interpret=True),
    )


def _dispatch_dm2d(gk, g, sizes, feat, heads):
    return jax.lax.platform_dependent(
        gk, g,
        tpu=lambda *a: pallas_grid_conv2d_dm(*a, sizes, feat, heads),
        default=lambda *a: pallas_grid_conv2d_dm(*a, sizes, feat, heads,
                                                 interpret=True),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _grid_conv(sizes, feat, heads, gk, kernel, bias):
    if len(sizes) == 2:
        m = pack_m2d(kernel, feat, heads, sizes)
        bt = pack_b2d(bias, feat, heads, sizes)
        return _dispatch_conv2d(gk, m, bt, sizes, feat, heads)
    w_mat = pack_w(kernel, feat, heads, sizes)
    b_col = pack_b(bias, feat, heads, sizes)
    return _dispatch_conv(gk, w_mat, b_col, sizes, feat, heads)


def _grid_conv_fwd(sizes, feat, heads, gk, kernel, bias):
    return _grid_conv(sizes, feat, heads, gk, kernel, bias), (gk, kernel)


def _grid_conv_bwd(sizes, feat, heads, res, g):
    gk, kernel = res
    x_dim, lane_extent, lanes, f_pad = kernel_grid_dims(sizes, feat)
    if len(sizes) == 2:
        blk = _blk2d(x_dim, f_pad)
        mT = pack_m2d_transposed(kernel, feat, heads, sizes)
        zb = jnp.zeros((heads, blk * f_pad, 1), jnp.float32)
        d_gk = _dispatch_conv2d(g, mT, zb, sizes, feat, heads)
        dm = _dispatch_dm2d(gk, g, sizes, feat, heads)
        d_kernel = unpack_dm2d(dm, feat, heads, sizes)
    else:
        # d_gk: transposed conv = same kernel, flipped/swapped weights
        wT = pack_w_transposed(kernel, feat, heads, sizes)
        zb = jnp.zeros((heads, f_pad, 1), jnp.float32)
        d_gk = _dispatch_conv(g, wT, zb, sizes, feat, heads)
        # d_kernel via the im2col x cotangent contraction
        dw_mat = _dispatch_dw(gk, g, sizes, feat, heads)
        d_kernel = unpack_dw(dw_mat, feat, heads, sizes)
    # d_bias: reduce the masked cotangent over batch, x and valid lanes
    r = g.shape[0]
    b = r // heads
    g5 = g.reshape(b, heads, x_dim, f_pad, lanes)[..., :lane_extent]
    d_bias = jnp.sum(g5, axis=(0, 2, 4))[:, :feat].reshape(heads * feat)
    return d_gk, d_kernel, d_bias


_grid_conv.defvjp(_grid_conv_fwd, _grid_conv_bwd)


def grid_conv_k(gk, kernel, bias, sizes, feat, heads):
    """Grouped 'same' 3^dim conv on a kernel-layout grid [R, X*F_pad, lanes]
    (R = B*heads).  ``kernel`` [*3^dim, F, H*F] grouped HWIO/DHWIO, ``bias``
    [H*F] — the same parameters as the XLA grouped conv it replaces
    (reference layers/multihead_ct.py:50-65)."""
    if bias is None:
        bias = jnp.zeros((heads * feat,), jnp.float32)
    return _grid_conv(tuple(sizes), feat, heads, gk, kernel, bias)
