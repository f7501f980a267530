"""Pallas TPU kernel: fused multi-vertex splat (scatter-max / scatter-add).

The splat op (SURVEY.md N4) is a scatter of S=2**dim weighted copies of each
point's feature vector into its enclosing grid-cell vertices.  XLA's TPU
scatter lowering costs ~40 cycles/update; this kernel performs the update
loop directly on a VMEM-resident grid, applying all S vertex contributions of
a point with two masked row-block read-modify-writes, with the weight/mask
arithmetic vectorized on the VPU.

Grid memory layout inside the kernel: rows = x * F_pad + f, lanes = y (2D) or
y*Z + z (3D), padded to >= 128 lanes.  A point's S vertices live in exactly
two row blocks (x and x+1) and at 2 (2D) or 4 (3D) lanes — each vertex weight
becomes a lane-one-hot, combined into one [F, L] outer-product update per row
block.

The same structure computes the scatter-ADD transpose of the slice gather
(op='add'), the backward of Slice.  The sorted segment reduction
(ops/segment.py) is the portable fallback used on CPU.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _splat_kernel(x0_ref, lane0_ref, lane0v_ref, wlo_ref, whi_ref,
                  values_ref, out_ref, *, n_points, f_pad, lanes, lane_offs,
                  op):
    out_ref[:] = jnp.zeros_like(out_ref)
    # wide grids: touch only a 256-lane window around the target lanes
    # (the 4 vertex lanes span at most Z+2 <= 128+1 positions)
    window = 256 if (lanes >= 512 and max(lane_offs) < 128) else lanes
    windowed = window != lanes
    lane_iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, window), 1)

    def tile_body(t, _):
        # Vectorize the mask/weight arithmetic over a tile of 8 points: per
        # point only the two fused row-block RMWs remain (the memory ops were
        # measured nearly free; the per-point scalar mask math was the cost).
        p0 = pl.multiple_of(t * 8, 8)
        vt = values_ref[0, pl.ds(p0, 8), :].T          # [F_pad, 8]
        lane8 = lane0v_ref[0, pl.ds(p0, 8), :]         # [8, 1] int32
        wlo8 = wlo_ref[0, pl.ds(p0, 8), :]             # [8, 4]
        whi8 = whi_ref[0, pl.ds(p0, 8), :]
        if windowed:
            # per-point window base, kept in lane-relative coordinates
            win8 = jnp.minimum((lane8 >> 7) << 7, lanes - window)
            rel8 = lane8 - win8
        else:
            rel8 = lane8
        m_lo = jnp.zeros((8, window), jnp.float32)
        m_hi = jnp.zeros((8, window), jnp.float32)
        for jj, off in enumerate(lane_offs):
            hit = (lane_iota8 == (rel8 + off)).astype(jnp.float32)
            m_lo = m_lo + wlo8[:, jj:jj + 1] * hit
            m_hi = m_hi + whi8[:, jj:jj + 1] * hit

        for j in range(8):
            i = t * 8 + j
            x0 = x0_ref[0, 0, i]
            vcol = vt[:, j:j + 1]  # [F_pad, 1], static lane slice
            upd = jnp.concatenate(
                [vcol * m_lo[j:j + 1, :], vcol * m_hi[j:j + 1, :]],
                axis=0)  # [2*F_pad, window] — rows x0 and x0+1 fused
            rows = pl.ds(pl.multiple_of(x0 * f_pad, f_pad), 2 * f_pad)
            if windowed:
                lane0 = lane0_ref[0, 0, i]
                win = pl.multiple_of(
                    jnp.minimum((lane0 >> 7) << 7, lanes - window), 128)
                cur = out_ref[0, rows, pl.ds(win, window)]
                new = jnp.maximum(cur, upd) if op == "max" else cur + upd
                out_ref[0, rows, pl.ds(win, window)] = new
            else:
                cur = out_ref[0, rows, :]
                new = jnp.maximum(cur, upd) if op == "max" else cur + upd
                out_ref[0, rows, :] = new
        return 0

    jax.lax.fori_loop(0, n_points // 8, tile_body, 0)


@functools.partial(jax.jit,
                   static_argnames=("sizes", "feat", "op", "interpret"))
def pallas_splat(x0, lane0, w_lo, w_hi, values, sizes, feat, op="max",
                 interpret=False):
    """Fused splat over a batch of independent grids.

    Args:
      x0: [R, K] int32 — first-axis base cell per point.
      lane0: [R, K] int32 — base lane (y0, or y0*Z + z0 for 3D).
      w_lo: [R, K, 4] f32 — vertex weights for the x0 row block, in lane
        offset order (2D: [w00, w01, 0, 0]; 3D: offsets [0, 1, Z, Z+1]).
      w_hi: [R, K, 4] f32 — weights for the x0+1 row block.
      values: [R, K, F] f32 — per-point features.
      sizes: grid spatial sizes tuple (X, Y) or (X, Y, Z).
      feat: F.
      op: 'max' (zero-init clamp comes free) or 'add'.

    Returns:
      grid [R, G, F] float32 (G = prod(sizes)).
    """
    r, k = x0.shape
    x_dim = sizes[0]
    lane_extent = int(np.prod(sizes[1:]))
    lanes = max(128, lane_extent)
    f_pad = max(8, feat)
    if values.shape[-1] != f_pad:
        values = jnp.pad(values,
                         ((0, 0), (0, 0), (0, f_pad - values.shape[-1])))
    if k % 8:
        # pad to a whole 8-point tile with zero-weight points
        extra = 8 - k % 8
        x0 = jnp.pad(x0, ((0, 0), (0, extra)))
        lane0 = jnp.pad(lane0, ((0, 0), (0, extra)))
        w_lo = jnp.pad(w_lo, ((0, 0), (0, extra), (0, 0)))
        w_hi = jnp.pad(w_hi, ((0, 0), (0, extra), (0, 0)))
        values = jnp.pad(values, ((0, 0), (0, extra), (0, 0)))
        k += extra

    if len(sizes) == 2:
        lane_offs = (0, 1)
    else:
        z = sizes[2]
        lane_offs = (0, 1, z, z + 1)

    kernel = functools.partial(
        _splat_kernel, n_points=k, f_pad=f_pad, lanes=lanes,
        lane_offs=lane_offs, op=op)

    out = pl.pallas_call(
        kernel,
        grid=(r,),
        in_specs=[
            pl.BlockSpec((1, 1, k), lambda bh: (bh, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, k), lambda bh: (bh, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, k, 1), lambda bh: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, 4), lambda bh: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, 4), lambda bh: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, f_pad), lambda bh: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, x_dim * f_pad, lanes),
                               lambda bh: (bh, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, x_dim * f_pad, lanes),
                                       jnp.float32),
        interpret=interpret,
    )(x0[:, None, :], lane0[:, None, :], lane0[..., None], w_lo, w_hi,
      values)  # values [R, K, F_pad]

    # [R, X*F_pad, lanes] -> [R, G, F]
    out = out.reshape(r, x_dim, f_pad, lanes)[:, :, :feat, :lane_extent]
    out = out.transpose(0, 1, 3, 2).reshape(
        r, x_dim * lane_extent, feat)
    return out


def vertex_decomposition(keys_scaled, sizes):
    """Per-point base cell + per-vertex weights in the kernel's layout.

    Args:
      keys_scaled: [..., dim] continuous grid coords in [0, size_d - 1]
        (the output of the gradient-balanced rescale, coords.py).
      sizes: (X, Y) or (X, Y, Z).

    Returns:
      x0 [...], lane0 [...] int32; w_lo, w_hi [..., 4] f32 (zero-padded for
      2D); ordering matches ``pallas_splat``'s ``lane_offs``.
    """
    dim = len(sizes)
    floored = jnp.floor(keys_scaled)
    frac = keys_scaled - floored
    base = floored.astype(jnp.int32)
    fx = frac[..., 0]
    if dim == 2:
        fy = frac[..., 1]
        x0 = base[..., 0]
        lane0 = base[..., 1]
        zeros = jnp.zeros_like(fx)
        w_lo = jnp.stack([(1 - fx) * (1 - fy), (1 - fx) * fy,
                          zeros, zeros], -1)
        w_hi = jnp.stack([fx * (1 - fy), fx * fy, zeros, zeros], -1)
    else:
        fy = frac[..., 1]
        fz = frac[..., 2]
        x0 = base[..., 0]
        lane0 = base[..., 1] * sizes[2] + base[..., 2]
        w_lo = jnp.stack([
            (1 - fx) * (1 - fy) * (1 - fz),
            (1 - fx) * (1 - fy) * fz,
            (1 - fx) * fy * (1 - fz),
            (1 - fx) * fy * fz,
        ], -1)
        w_hi = jnp.stack([
            fx * (1 - fy) * (1 - fz),
            fx * (1 - fy) * fz,
            fx * fy * (1 - fz),
            fx * fy * fz,
        ], -1)
    return x0, lane0, w_lo, w_hi


# ---------------------------------------------------------------------------
# Slice kernel: the gather-transpose of the splat (same mask machinery)
# ---------------------------------------------------------------------------

def _slice_kernel(x0_ref, lane0_ref, lane0v_ref, wlo_ref, whi_ref, grid_ref,
                  out_ref, *, n_points, f_pad, lanes, lane_offs):
    window = 256 if (lanes >= 512 and max(lane_offs) < 128) else lanes
    windowed = window != lanes
    lane_iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, window), 1)

    def tile_body(t, _):
        p0 = pl.multiple_of(t * 8, 8)
        lane8 = lane0v_ref[0, pl.ds(p0, 8), :]
        wlo8 = wlo_ref[0, pl.ds(p0, 8), :]
        whi8 = whi_ref[0, pl.ds(p0, 8), :]
        rel8 = (lane8 - jnp.minimum((lane8 >> 7) << 7, lanes - window)
                if windowed else lane8)
        m_lo = jnp.zeros((8, window), jnp.float32)
        m_hi = jnp.zeros((8, window), jnp.float32)
        for jj, off in enumerate(lane_offs):
            hit = (lane_iota8 == (rel8 + off)).astype(jnp.float32)
            m_lo = m_lo + wlo8[:, jj:jj + 1] * hit
            m_hi = m_hi + whi8[:, jj:jj + 1] * hit

        cols = []
        for j in range(8):
            i = t * 8 + j
            x0 = x0_ref[0, 0, i]
            rows = pl.ds(pl.multiple_of(x0 * f_pad, f_pad), 2 * f_pad)
            if windowed:
                lane0 = lane0_ref[0, 0, i]
                win = pl.multiple_of(
                    jnp.minimum((lane0 >> 7) << 7, lanes - window), 128)
                cur = grid_ref[0, rows, pl.ds(win, window)]
            else:
                cur = grid_ref[0, rows, :]
            prod = (cur[:f_pad] * m_lo[j:j + 1, :]
                    + cur[f_pad:] * m_hi[j:j + 1, :])
            cols.append(jnp.sum(prod, axis=1, keepdims=True))  # [F_pad, 1]
        out_ref[0, pl.ds(p0, 8), :] = jnp.concatenate(cols, axis=1).T
        return 0

    jax.lax.fori_loop(0, n_points // 8, tile_body, 0)


@functools.partial(jax.jit,
                   static_argnames=("sizes", "feat", "interpret"))
def pallas_slice(x0, lane0, w_lo, w_hi, grid, sizes, feat, interpret=False):
    """Fused multi-vertex slice: grid [R, G, F] -> per-point weighted sums
    [R, K, F]. Inputs as in pallas_splat."""
    r, k = x0.shape
    x_dim = sizes[0]
    lane_extent = int(np.prod(sizes[1:]))
    lanes = max(128, lane_extent)
    f_pad = max(8, feat)
    k_pad = -(-k // 8) * 8
    if k_pad != k:
        x0 = jnp.pad(x0, ((0, 0), (0, k_pad - k)))
        lane0 = jnp.pad(lane0, ((0, 0), (0, k_pad - k)))
        w_lo = jnp.pad(w_lo, ((0, 0), (0, k_pad - k), (0, 0)))
        w_hi = jnp.pad(w_hi, ((0, 0), (0, k_pad - k), (0, 0)))

    # [R, G, F] -> kernel layout [R, X*F_pad, lanes]
    g4 = grid.reshape(r, x_dim, lane_extent, grid.shape[-1])
    g4 = jnp.pad(g4, ((0, 0), (0, 0), (0, lanes - lane_extent),
                      (0, f_pad - grid.shape[-1])))
    gk = g4.transpose(0, 1, 3, 2).reshape(r, x_dim * f_pad, lanes)

    if len(sizes) == 2:
        lane_offs = (0, 1)
    else:
        z = sizes[2]
        lane_offs = (0, 1, z, z + 1)

    kernel = functools.partial(
        _slice_kernel, n_points=k_pad, f_pad=f_pad, lanes=lanes,
        lane_offs=lane_offs)
    out = pl.pallas_call(
        kernel,
        grid=(r,),
        in_specs=[
            pl.BlockSpec((1, 1, k_pad), lambda bh: (bh, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, k_pad), lambda bh: (bh, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, k_pad, 1), lambda bh: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad, 4), lambda bh: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad, 4), lambda bh: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, x_dim * f_pad, lanes), lambda bh: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k_pad, f_pad), lambda bh: (bh, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, k_pad, f_pad), jnp.float32),
        interpret=interpret,
    )(x0[:, None, :], lane0[:, None, :], lane0[..., None], w_lo, w_hi, gk)
    return out[:, :k, :feat]


# ---------------------------------------------------------------------------
# Splat backward kernel: winner-routed cotangents + weight/value grads
# ---------------------------------------------------------------------------

def _splat_bwd_kernel(x0_ref, lane0_ref, lane0v_ref, wlo_ref, whi_ref,
                      values_ref, grid_ref, g_ref,
                      dwlo_ref, dwhi_ref, dval_ref,
                      *, n_points, f_pad, lanes, lane_offs):
    window = 256 if (lanes >= 512 and max(lane_offs) < 128) else lanes
    windowed = window != lanes
    lane_iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, window), 1)

    def tile_body(t, _):
        p0 = pl.multiple_of(t * 8, 8)
        vt = values_ref[0, pl.ds(p0, 8), :].T          # [F_pad, 8]
        lane8 = lane0v_ref[0, pl.ds(p0, 8), :]
        wlo8 = wlo_ref[0, pl.ds(p0, 8), :]
        whi8 = whi_ref[0, pl.ds(p0, 8), :]
        rel8 = (lane8 - jnp.minimum((lane8 >> 7) << 7, lanes - window)
                if windowed else lane8)
        hits = []
        m_lo = jnp.zeros((8, window), jnp.float32)
        m_hi = jnp.zeros((8, window), jnp.float32)
        for jj, off in enumerate(lane_offs):
            hit = (lane_iota8 == (rel8 + off)).astype(jnp.float32)
            hits.append(hit)
            m_lo = m_lo + wlo8[:, jj:jj + 1] * hit
            m_hi = m_hi + whi8[:, jj:jj + 1] * hit

        dval_cols = []
        for j in range(8):
            i = t * 8 + j
            x0 = x0_ref[0, 0, i]
            vcol = vt[:, j:j + 1]
            rows = pl.ds(pl.multiple_of(x0 * f_pad, f_pad), 2 * f_pad)
            if windowed:
                lane0 = lane0_ref[0, 0, i]
                win = pl.multiple_of(
                    jnp.minimum((lane0 >> 7) << 7, lanes - window), 128)
                cur = grid_ref[0, rows, pl.ds(win, window)]
                gg = g_ref[0, rows, pl.ds(win, window)]
            else:
                cur = grid_ref[0, rows, :]
                gg = g_ref[0, rows, :]
            contrib = jnp.concatenate(
                [vcol * m_lo[j:j + 1, :], vcol * m_hi[j:j + 1, :]], axis=0)
            winner = (contrib == cur) & (cur > 0.0)
            dcon = jnp.where(winner, gg, 0.0)           # [2F, W]
            # d_w per vertex: sum_f v[f] * dcon[f, lane_s]
            t_lo = jnp.sum(vcol * dcon[:f_pad], axis=0, keepdims=True)
            t_hi = jnp.sum(vcol * dcon[f_pad:], axis=0, keepdims=True)
            def row4(tt):
                # all four pieces share shape/provenance (a constant-zero
                # operand trips Mosaic's concat layout check)
                pieces = [
                    jnp.sum(tt * hits[min(jj, len(lane_offs) - 1)][j:j + 1, :],
                            axis=1, keepdims=True)
                    * (1.0 if jj < len(lane_offs) else 0.0)
                    for jj in range(4)]
                return jnp.concatenate(pieces, axis=1)

            dwlo_ref[0, pl.ds(i, 1), :] = row4(t_lo)
            dwhi_ref[0, pl.ds(i, 1), :] = row4(t_hi)
            # d_values: sum_s w_s * dcon at the vertex lanes
            dval_cols.append(jnp.sum(
                dcon[:f_pad] * m_lo[j:j + 1, :]
                + dcon[f_pad:] * m_hi[j:j + 1, :], axis=1, keepdims=True))
        dval_ref[0, pl.ds(p0, 8), :] = jnp.concatenate(dval_cols, axis=1).T
        return 0

    jax.lax.fori_loop(0, n_points // 8, tile_body, 0)


@functools.partial(jax.jit, static_argnames=("sizes", "feat", "interpret"))
def pallas_splat_bwd(x0, lane0, w_lo, w_hi, values, grid, g, sizes, feat,
                     interpret=False):
    """Backward of the splat: cotangent ``g`` [R, G, F] routed to the argmax
    winners -> (d_w_lo [R,K,4], d_w_hi [R,K,4], d_values [R,K,F])."""
    r, k = x0.shape
    x_dim = sizes[0]
    lane_extent = int(np.prod(sizes[1:]))
    lanes = max(128, lane_extent)
    f_pad = max(8, feat)
    k_pad = -(-k // 8) * 8
    if values.shape[-1] != f_pad:
        values = jnp.pad(values,
                         ((0, 0), (0, 0), (0, f_pad - values.shape[-1])))
    if k_pad != k:
        x0 = jnp.pad(x0, ((0, 0), (0, k_pad - k)))
        lane0 = jnp.pad(lane0, ((0, 0), (0, k_pad - k)))
        w_lo = jnp.pad(w_lo, ((0, 0), (0, k_pad - k), (0, 0)))
        w_hi = jnp.pad(w_hi, ((0, 0), (0, k_pad - k), (0, 0)))
        values = jnp.pad(values, ((0, 0), (0, k_pad - k), (0, 0)))

    def to_kernel_layout(a):
        a4 = a.reshape(r, x_dim, lane_extent, a.shape[-1])
        a4 = jnp.pad(a4, ((0, 0), (0, 0), (0, lanes - lane_extent),
                          (0, f_pad - a.shape[-1])))
        return a4.transpose(0, 1, 3, 2).reshape(r, x_dim * f_pad, lanes)

    grid_k = to_kernel_layout(grid)
    g_k = to_kernel_layout(g)

    if len(sizes) == 2:
        lane_offs = (0, 1)
    else:
        z = sizes[2]
        lane_offs = (0, 1, z, z + 1)

    kernel = functools.partial(
        _splat_bwd_kernel, n_points=k_pad, f_pad=f_pad, lanes=lanes,
        lane_offs=lane_offs)
    spec_k = lambda shape: pl.BlockSpec(shape, lambda bh: (bh,) + (0,) * (
        len(shape) - 1), memory_space=pltpu.VMEM)
    dwlo, dwhi, dval = pl.pallas_call(
        kernel,
        grid=(r,),
        in_specs=[
            pl.BlockSpec((1, 1, k_pad), lambda bh: (bh, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, k_pad), lambda bh: (bh, 0, 0),
                         memory_space=pltpu.SMEM),
            spec_k((1, k_pad, 1)),
            spec_k((1, k_pad, 4)),
            spec_k((1, k_pad, 4)),
            spec_k((1, k_pad, f_pad)),
            spec_k((1, x_dim * f_pad, lanes)),
            spec_k((1, x_dim * f_pad, lanes)),
        ],
        out_specs=(spec_k((1, k_pad, 4)), spec_k((1, k_pad, 4)),
                   spec_k((1, k_pad, f_pad))),
        out_shape=(jax.ShapeDtypeStruct((r, k_pad, 4), jnp.float32),
                   jax.ShapeDtypeStruct((r, k_pad, 4), jnp.float32),
                   jax.ShapeDtypeStruct((r, k_pad, f_pad), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x0[:, None, :], lane0[:, None, :], lane0[..., None], w_lo, w_hi,
      values, grid_k, g_k)
    return dwlo[:, :k, :], dwhi[:, :k, :], dval[:, :k, :feat]
