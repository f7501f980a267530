#!/usr/bin/env python
"""Micro-bench of the kernel-layout grouped conv at the classifier shapes.

Times pallas_grid_conv per (sizes, feat) combo at the production batch
(B=8, H=16 -> R=128) on the real chip, against the XLA grouped conv WITH
its two boundary layout conversions (the thing it replaces).  Used to
attribute and tune the conv kernel (round-4 headline item).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


SHAPES = [  # (sizes, feat) per classifier stage plan (classifier.py:46-63)
    ((128, 128), 4),
    ((64, 64), 16),
    ((16, 16), 16),
    ((32, 32, 32), 4),
    ((16, 16, 16), 16),
    ((8, 8, 8), 32),
]
HEADS = 16
BATCH = 8


def measure(fn, *args, iters=20):
    import jax
    import jax.numpy as jnp

    def sync(out):
        np.asarray(jnp.sum(jax.tree_util.tree_leaves(out)[0]))

    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from cloud_transformers_tpu.ops.pallas_grid_conv import grid_conv_k
    from cloud_transformers_tpu.ops.pallas_splat import kernel_grid_dims
    from cloud_transformers_tpu.core.splat_slice import (
        gridk_to_spatial, spatial_to_gridk)

    total_p, total_x = 0.0, 0.0
    for sizes, feat in SHAPES:
        dim = len(sizes)
        x_dim, ext, lanes, f_pad = kernel_grid_dims(sizes, feat)
        r = BATCH * HEADS
        key = jax.random.PRNGKey(0)
        gk = jax.random.normal(key, (r, x_dim * f_pad, lanes))
        kernel = jax.random.normal(key, (3,) * dim + (feat, HEADS * feat))
        bias = jnp.zeros((HEADS * feat,))

        f_p = jax.jit(lambda g: grid_conv_k(
            g, kernel, bias, sizes, feat, HEADS))
        dt_p = measure(f_p, gk)

        # XLA grouped conv + the two boundary conversions it needs
        dn = (("NHWC", "HWIO", "NHWC") if dim == 2
              else ("NDHWC", "DHWIO", "NDHWC"))
        kd = jnp.einsum("...cgo,hg->...hcgo",
                        kernel.reshape(kernel.shape[:-2]
                                       + (feat, HEADS, feat)),
                        jnp.eye(HEADS)).reshape(
            kernel.shape[:-2] + (HEADS * feat, HEADS * feat))

        def f_xla(g):
            gs = gridk_to_spatial(g, BATCH, sizes, feat)
            out = jax.lax.conv_general_dilated(
                gs, kd, window_strides=(1,) * dim, padding=[(1, 1)] * dim,
                dimension_numbers=dn, feature_group_count=1)
            return spatial_to_gridk(out, HEADS, sizes, feat)

        dt_x = measure(jax.jit(f_xla), gk)
        total_p += dt_p
        total_x += dt_x
        print(f"{str(sizes):>14} F={feat:<3} pallas {dt_p*1e3:7.2f} ms   "
              f"xla+layout {dt_x*1e3:7.2f} ms")
    print(f"{'TOTAL':>14}       pallas {total_p*1e3:7.2f} ms   "
          f"xla+layout {total_x*1e3:7.2f} ms   (x4 repeats in model)")


if __name__ == "__main__":
    main()
