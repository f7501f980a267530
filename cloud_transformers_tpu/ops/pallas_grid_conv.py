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


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _grid_conv(sizes, feat, heads, gk, kernel, bias):
    w_mat = pack_w(kernel, feat, heads, sizes)
    b_col = pack_b(bias, feat, heads, sizes)
    return _dispatch_conv(gk, w_mat, b_col, sizes, feat, heads)


def _grid_conv_fwd(sizes, feat, heads, gk, kernel, bias):
    return _grid_conv(sizes, feat, heads, gk, kernel, bias), (gk, kernel)


def _grid_conv_bwd(sizes, feat, heads, res, g):
    gk, kernel = res
    x_dim, lane_extent, lanes, f_pad = kernel_grid_dims(sizes, feat)
    # d_gk: transposed conv = same kernel, flipped/swapped weights, no bias
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
