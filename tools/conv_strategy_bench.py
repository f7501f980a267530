#!/usr/bin/env python
"""Measure grid-conv strategies for the MultiHead splat->conv->slice unit.

The profiled classifier forward spends ~24% of device time in XLA layout
copies around the grouped grid conv (grid_to_spatial / spatial_to_grid
interleave the head axis into channels and back; the conv itself also gets
relayout copies).  This tool times a full splat->conv->slice unit under
several conv formulations to pick the cheapest end-to-end one:

  interleave : current production path — [B,H,G,F] -> [B,*sp,H*F],
               block-diagonal dense conv, back.  Two lane-crossing
               transposes of the full grid per unit.
  perhead    : unrolled H convs on [B,*sp,F] slices of [B,H,G,F]
               (axis-1 slice + stack; no channel interleave; slice
               consumes [B,H,G,F] directly).
  bgc        : batch_group_count=H conv on the free [B*H,*sp,F] reshape
               (input-side transpose avoided; output is channel-
               interleaved and still needs spatial_to_grid).

Run on the real chip: python tools/conv_strategy_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(fn, *args, iters=20, warmup=3):
    import jax
    import jax.numpy as jnp

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jnp.sum(leaf))

    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def build(batch, points, heads, feat, sizes, dim, strategy, dtype):
    import jax
    import jax.numpy as jnp
    from cloud_transformers_tpu.core import (grid_mapping, splat_max_mapping,
                                             slice_grid_mapping)
    from cloud_transformers_tpu.nn.multihead import (grid_to_spatial,
                                                     spatial_to_grid)

    h, f = heads, feat
    key = jax.random.PRNGKey(0)
    keys = jnp.tanh(jax.random.normal(key, (batch, points, h, dim)))
    values = jax.random.normal(key, (batch, points, h * f))
    # grouped kernel, one [*k, F, F] filter per head
    wk = jax.random.normal(key, (h,) + (3,) * dim + (f, f)) * 0.1

    dn3 = ("NDHWC", "DHWIO", "NDHWC") if dim == 3 else ("NHWC", "HWIO", "NHWC")

    def conv_interleave(grid):
        gs = grid_to_spatial(grid, sizes)
        k4 = jnp.moveaxis(wk, 0, -2)                      # [*k, F, H, F]
        eye = jnp.eye(h, dtype=wk.dtype)
        dense = jnp.einsum("...cgo,hg->...hcgo", k4, eye)
        dense = dense.reshape((3,) * dim + (h * f, h * f))
        xq, kq = gs.astype(dtype), dense.astype(dtype)
        out = jax.lax.conv_general_dilated(
            xq, kq, (1,) * dim, [(1, 1)] * dim,
            dimension_numbers=jax.lax.conv_dimension_numbers(
                xq.shape, kq.shape, dn3)).astype(jnp.float32)
        return spatial_to_grid(out, h)

    def conv_perhead(grid):
        b = grid.shape[0]
        gsp = grid.reshape((b, h) + sizes + (f,))
        outs = []
        for i in range(h):
            xq = gsp[:, i].astype(dtype)
            kq = wk[i].astype(dtype)
            outs.append(jax.lax.conv_general_dilated(
                xq, kq, (1,) * dim, [(1, 1)] * dim,
                dimension_numbers=jax.lax.conv_dimension_numbers(
                    xq.shape, kq.shape, dn3)).astype(jnp.float32))
        out = jnp.stack(outs, axis=1)                     # [B, H, *sp, F]
        return out.reshape(b, h, -1, f)

    def conv_bgc(grid):
        b = grid.shape[0]
        # R is h-minor ([B,H]); batch_group_count needs the grouped dim
        # contiguous-major, so fold H into batch as-is and group by... XLA
        # groups [N] into bgc contiguous blocks -> need h-major. Transpose
        # the (small-entry) batch dims of the grid: [B,H,...]->[H*B,...].
        gsp = grid.reshape((b, h) + sizes + (f,))
        gsp = jnp.moveaxis(gsp, 1, 0).reshape((h * b,) + sizes + (f,))
        kq = jnp.concatenate([wk[i] for i in range(h)], axis=-1)  # [*k,F,H*F]
        out = jax.lax.conv_general_dilated(
            gsp.astype(dtype), kq.astype(dtype), (1,) * dim, [(1, 1)] * dim,
            dimension_numbers=jax.lax.conv_dimension_numbers(
                ((b,) + sizes + (f,)), kq.shape, dn3),
            batch_group_count=h).astype(jnp.float32)      # [B,*sp,H*F]
        return spatial_to_grid(out, h)

    conv = {"interleave": conv_interleave, "perhead": conv_perhead,
            "bgc": conv_bgc}[strategy]

    @jax.jit
    def unit(keys, values):
        m = grid_mapping(keys, sizes, dim)
        grid = splat_max_mapping(m, values, sizes)
        grid = conv(grid)
        return slice_grid_mapping(m, grid, sizes)

    return unit, (keys, values)


def main():
    import jax.numpy as jnp
    shapes = [
        # (label, B, P, H, F, sizes, dim) — the classifier stage shapes
        ("u0_3d 32^3 F4", 8, 2048, 16, 4, (32, 32, 32), 3),
        ("u0_2d 128^2 F4", 8, 2048, 16, 4, (128, 128), 2),
        ("u1_3d 16^3 F16", 8, 2048, 16, 16, (16, 16, 16), 3),
    ]
    for dtype, dname in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        for label, b, p, h, f, sizes, dim in shapes:
            row = [f"{label:16s} {dname}"]
            for strat in ("interleave", "perhead", "bgc"):
                try:
                    fn, args = build(b, p, h, f, sizes, dim, strat, dtype)
                    dt = measure(fn, *args, iters=10)
                    row.append(f"{strat}={dt*1e3:7.2f}ms")
                except Exception as e:
                    row.append(f"{strat}=ERR({type(e).__name__})")
            print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
