"""Pallas TPU kernel: FUSED splat -> grouped conv -> slice (one MHCT block).

The MHCT hot loop (reference /root/reference/layers/multihead_ct.py:50-65,
107) runs three Pallas kernels back to back over the same kernel-layout grid
[R=B*H, X*F_pad, lanes]: splat writes it to HBM, the grouped conv reads and
rewrites it, the slice reads it again.  With the classifier forward now
>93% Pallas kernel time and each kernel at its per-point scalar-issue floor
(ops/pallas_splat.py tuning notes), the remaining end-to-end overhead is
BETWEEN the kernels: two grid HBM round trips, two extra kernel dispatches,
and the conv's own dispatch per block.

This kernel performs the whole block per grid row in one pallas_call:

  phase 1 (splat): the _splat_kernel body accumulates the grid in the
      output ref (scratch banks as usual);
  phase 2 (conv):  the grouped 3^dim conv body (pallas_grid_conv: im2col +
      one MXU matmul per x row for 3D, block-banded tap matmuls for 2D)
      reads the grid from VMEM and writes the conved grid;
  phase 3 (slice): the _slice_kernel body gathers per-point outputs from
      the conved grid still resident in VMEM.

Outputs: (pts, gk[, gk2]).  gk (the pre-conv grid) is always produced — the
per-block occupancy stats read it, and the splat backward routes winners
through it.  gk2 (the conved grid) is only produced under differentiation
(``want_gk2``): the slice backward needs it for the d_w dots; inference
skips the write.  The backward itself reuses the existing three backward
kernels (core/splat_slice.py wires the custom VJP).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cloud_transformers_tpu.ops.pallas_splat import (
    _build_masks,
    _lane_reduce,
    _load_point_tile,
    _n_point_refs,
    _pad_points,
    _pick_banks,
    _pick_tile,
    _point_args,
    _point_specs,
    _window_of,
    kernel_grid_dims,
)
from cloud_transformers_tpu.ops.pallas_grid_conv import (
    _blk2d,
    _tap_masks,
    _tap_shifts,
    pack_b,
    pack_b2d,
    pack_m2d,
    pack_w,
)


def _splat_phase(x0_ref, lane0_ref, data_refs, gk_ref, banks_s, *,
                 n_points, f_pad, lanes, lane_offs, tile, banks):
    """The _splat_kernel body writing into ``gk_ref`` (op='max')."""
    gk_ref[:] = jnp.zeros_like(gk_ref)
    tgts = (gk_ref,) + tuple(banks_s)
    for s in tgts[1:]:
        s[:] = jnp.zeros_like(s)
    window, windowed = _window_of(lanes, lane_offs)
    T = tile
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (T, window), 1)

    def tile_body(t, _):
        lane_t, wlo_t, whi_t, vt = _load_point_tile(data_refs, t, f_pad,
                                                    tile)
        rel = (lane_t - jnp.minimum((lane_t >> 7) << 7, lanes - window)
               if windowed else lane_t)
        m_lo, m_hi, _ = _build_masks(lane_iota, rel, wlo_t, whi_t, lane_offs)
        for j in range(T):
            i = t * T + j
            x0 = x0_ref[0, 0, i]
            vcol = vt[:, j:j + 1]
            upd = jnp.concatenate(
                [vcol * m_lo[j:j + 1, :], vcol * m_hi[j:j + 1, :]], axis=0)
            rows = pl.ds(pl.multiple_of(x0 * f_pad, f_pad), 2 * f_pad)
            tgt = tgts[j % banks]
            if windowed:
                lane0 = lane0_ref[0, 0, i]
                win = pl.multiple_of(
                    jnp.minimum((lane0 >> 7) << 7, lanes - window), 128)
                cur = tgt[0, rows, pl.ds(win, window)]
                tgt[0, rows, pl.ds(win, window)] = jnp.maximum(cur, upd)
            else:
                cur = tgt[0, rows, :]
                tgt[0, rows, :] = jnp.maximum(cur, upd)
        return 0

    jax.lax.fori_loop(0, n_points // T, tile_body, 0)
    acc = gk_ref[:]
    for s in tgts[1:]:
        acc = jnp.maximum(acc, s[:])
    if banks > 1:
        gk_ref[:] = acc


def _conv_phase3d(gk_ref, w_ref, b_ref, g2_ref, pad_ref, im_ref, *,
                  sizes, x_dim, f_pad, lanes, lane_extent):
    """The pallas_grid_conv body: VMEM grid -> VMEM conved grid."""
    shifts = _tap_shifts(sizes)
    masks, valid_out = _tap_masks(sizes, lanes, lane_extent)
    pad_ref[0:f_pad, :] = jnp.zeros((f_pad, lanes), jnp.float32)
    pad_ref[pl.ds((x_dim + 1) * f_pad, f_pad), :] = jnp.zeros(
        (f_pad, lanes), jnp.float32)
    pad_ref[pl.ds(f_pad, x_dim * f_pad), :] = gk_ref[0]
    w = w_ref[0]
    bias = b_ref[0]

    def x_body(x, _):
        x0 = pl.multiple_of(x * f_pad, f_pad)
        slab = pad_ref[pl.ds(x0, 3 * f_pad), :]
        for t, (s, _, _) in enumerate(shifts):
            rolled = pltpu.roll(slab, (-s) % lanes, axis=1) if s else slab
            im_ref[t * 3 * f_pad:(t + 1) * 3 * f_pad, :] = rolled * masks[t]
        acc = jax.lax.dot_general(
            w, im_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        g2_ref[0, pl.ds(x0, f_pad), :] = (acc + bias) * valid_out
        return 0

    jax.lax.fori_loop(0, x_dim, x_body, 0)


def _conv_phase2d(gk_ref, m_ref, b_ref, g2_ref, pad_ref, t_ref, *,
                  sizes, x_dim, f_pad, lanes, lane_extent, blk):
    """The pallas_grid_conv2d banded body: VMEM grid -> VMEM conved grid."""
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
    bias = b_ref[0]
    for i in range(x_dim // blk):
        x0 = i * blk * f_pad
        acc = jnp.zeros((blk * f_pad, lanes), jnp.float32)
        for t in range(len(shifts)):
            acc += jax.lax.dot_general(
                m_ref[0, t], t_ref[t, pl.ds(x0, sbl), :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        g2_ref[0, pl.ds(x0, blk * f_pad), :] = (acc + bias) * valid_out


def _slice_phase(x0_ref, lane0_ref, data_refs, g2_ref, out_ref, cols_ref, *,
                 n_points, f_pad, lanes, lane_offs, tile):
    """The _slice_kernel body reading the conved grid from VMEM."""
    window, windowed = _window_of(lanes, lane_offs)
    T = tile
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (T, window), 1)

    def tile_body(t, _):
        p0 = pl.multiple_of(t * T, T)
        lane_t, wlo_t, whi_t, _ = _load_point_tile(data_refs, t, tile=tile)
        rel = (lane_t - jnp.minimum((lane_t >> 7) << 7, lanes - window)
               if windowed else lane_t)
        m_lo, m_hi, _ = _build_masks(lane_iota, rel, wlo_t, whi_t, lane_offs)
        for j in range(T):
            i = t * T + j
            x0 = x0_ref[0, 0, i]
            rows = pl.ds(pl.multiple_of(x0 * f_pad, f_pad), 2 * f_pad)
            if windowed:
                lane0 = lane0_ref[0, 0, i]
                win = pl.multiple_of(
                    jnp.minimum((lane0 >> 7) << 7, lanes - window), 128)
                cur = g2_ref[0, rows, pl.ds(win, window)]
            else:
                cur = g2_ref[0, rows, :]
            prod = (cur[:f_pad] * m_lo[j:j + 1, :]
                    + cur[f_pad:] * m_hi[j:j + 1, :])
            cols_ref[:, j:j + 1] = _lane_reduce(prod)
        out_ref[0, pl.ds(p0, T), :] = cols_ref[:].T
        return 0

    jax.lax.fori_loop(0, n_points // T, tile_body, 0)


@functools.partial(jax.jit,
                   static_argnames=("sizes", "feat", "heads", "want_gk2",
                                    "interpret"))
def pallas_fused_block(x0, lane0, w_lo, w_hi, values, kernel, bias, sizes,
                       feat, heads, want_gk2=False, interpret=False):
    """Fused splat -> grouped 3^dim conv -> slice over a batch of grids.

    Args (as in ``pallas_splat`` / ``grid_conv_k``):
      x0, lane0: [R, K] int32; w_lo, w_hi: [R, K, 4] f32;
      values: [R, K, F] f32; kernel: [*3^dim, F, H*F]; bias: [H*F].

    Returns (pts [R, K, F], gk, gk2?) — grids in the kernel layout.
    """
    r, k_orig = x0.shape
    x_dim, lane_extent, lanes, f_pad = kernel_grid_dims(sizes, feat)
    dim = len(sizes)
    h = heads
    if values.shape[-1] != f_pad:
        values = jnp.pad(values,
                         ((0, 0), (0, 0), (0, f_pad - values.shape[-1])))
    tile = _pick_tile(k_orig, interpret)
    k_pad, x0, lane0, w_lo, w_hi, values = _pad_points(
        tile, k_orig, x0, lane0, w_lo, w_hi, values)

    if dim == 2:
        lane_offs = (0, 1)
        blk = _blk2d(x_dim, f_pad)
        sbl = (blk + 2) * f_pad
        w_in = pack_m2d(kernel, feat, heads, sizes)   # [H,3,blk*F_pad,sbl]
        b_in = pack_b2d(bias, feat, heads, sizes)     # [H, blk*F_pad, 1]
        w_spec = pl.BlockSpec((1, 3, blk * f_pad, sbl),
                              lambda i: (i % h, 0, 0, 0),
                              memory_space=pltpu.VMEM)
        b_spec = pl.BlockSpec((1, blk * f_pad, 1), lambda i: (i % h, 0, 0),
                              memory_space=pltpu.VMEM)
        conv_scratch = [
            pltpu.VMEM(((x_dim + 2) * f_pad, lanes), jnp.float32),
            pltpu.VMEM((3, (x_dim + 2) * f_pad, lanes), jnp.float32),
        ]
    else:
        z = sizes[2]
        lane_offs = (0, 1, z, z + 1)
        blk = 0
        k3 = len(_tap_shifts(sizes)) * 3 * f_pad
        w_in = pack_w(kernel, feat, heads, sizes)     # [H, F_pad, K3]
        b_in = pack_b(bias, feat, heads, sizes)       # [H, F_pad, 1]
        w_spec = pl.BlockSpec((1, f_pad, k3), lambda i: (i % h, 0, 0),
                              memory_space=pltpu.VMEM)
        b_spec = pl.BlockSpec((1, f_pad, 1), lambda i: (i % h, 0, 0),
                              memory_space=pltpu.VMEM)
        conv_scratch = [
            pltpu.VMEM(((x_dim + 2) * f_pad, lanes), jnp.float32),
            pltpu.VMEM((k3, lanes), jnp.float32),
        ]

    grid_bytes = x_dim * f_pad * lanes * 4
    banks = _pick_banks(grid_bytes)
    n_data = _n_point_refs(k_pad)
    window, _ = _window_of(lanes, lane_offs)

    def fused(x0_ref, lane0_ref, *refs):
        data_refs = refs[:n_data]
        w_ref, b_ref = refs[n_data:n_data + 2]
        pts_ref = refs[n_data + 2]
        gk_ref = refs[n_data + 3]
        nxt = n_data + 4
        if want_gk2:
            g2_ref = refs[nxt]
            nxt += 1
        scratch = refs[nxt:]
        banks_s = scratch[:banks - 1]
        scratch = scratch[banks - 1:]
        if not want_gk2:
            g2_ref = scratch[0]
            scratch = scratch[1:]
        pad_ref, im_ref, cols_ref = scratch

        _splat_phase(x0_ref, lane0_ref, data_refs, gk_ref, banks_s,
                     n_points=k_pad, f_pad=f_pad, lanes=lanes,
                     lane_offs=lane_offs, tile=tile, banks=banks)
        if dim == 2:
            _conv_phase2d(gk_ref, w_ref, b_ref, g2_ref, pad_ref, im_ref,
                          sizes=tuple(sizes), x_dim=x_dim, f_pad=f_pad,
                          lanes=lanes, lane_extent=lane_extent, blk=blk)
        else:
            _conv_phase3d(gk_ref, w_ref, b_ref, g2_ref, pad_ref, im_ref,
                          sizes=tuple(sizes), x_dim=x_dim, f_pad=f_pad,
                          lanes=lanes, lane_extent=lane_extent)
        # scratch g2 has the same (1, X*F_pad, lanes) block shape as the
        # output ref, so the slice phase indexes either identically; the
        # slice consumes only the mask payload (drop the values ref)
        _slice_phase(x0_ref, lane0_ref, data_refs[:-1], g2_ref, pts_ref,
                     cols_ref,
                     n_points=k_pad, f_pad=f_pad, lanes=lanes,
                     lane_offs=lane_offs, tile=tile)

    grid_shape = jax.ShapeDtypeStruct((r, x_dim * f_pad, lanes), jnp.float32)
    out_shapes = [jax.ShapeDtypeStruct((r, k_pad, f_pad), jnp.float32),
                  grid_shape]
    out_specs = [pl.BlockSpec((1, k_pad, f_pad), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, x_dim * f_pad, lanes), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)]
    if want_gk2:
        out_shapes.append(grid_shape)
        out_specs.append(out_specs[1])

    scratch_shapes = [pltpu.VMEM((1, x_dim * f_pad, lanes), jnp.float32)
                      for _ in range(banks - 1)]
    if not want_gk2:
        scratch_shapes.append(
            pltpu.VMEM((1, x_dim * f_pad, lanes), jnp.float32))
    scratch_shapes += conv_scratch
    scratch_shapes.append(pltpu.VMEM((f_pad, tile), jnp.float32))

    outs = pl.pallas_call(
        fused,
        grid=(r,),
        in_specs=[
            pl.BlockSpec((1, 1, k_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, k_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ] + _point_specs(k_pad, f_pad, tile) + [w_spec, b_spec],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x0[:, None, :], lane0[:, None, :],
      *_point_args(lane0, w_lo, w_hi, values, tile), w_in, b_in)

    pts = outs[0][:, :k_orig, :feat]
    return (pts,) + tuple(outs[1:])
