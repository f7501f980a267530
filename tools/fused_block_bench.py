#!/usr/bin/env python
"""Measure the fused splat->conv->slice kernel vs the three separate kernels,
standalone (per classifier stage shape) and in-model.  Evidence behind the
block_fusion_strategy 'auto' table in nn/grouped_conv.py.

Usage: python tools/fused_block_bench.py [--model]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def measure(fn, *args, iters=10):
    import jax
    import jax.numpy as jnp
    out = fn(*args)
    np.asarray(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    return (time.perf_counter() - t0) / iters


def standalone():
    import jax
    import jax.numpy as jnp
    import cloud_transformers_tpu.ops.pallas_splat as ps
    import cloud_transformers_tpu.ops.pallas_grid_conv as pgc
    from cloud_transformers_tpu.ops.pallas_fused_block import (
        pallas_fused_block)

    rng = np.random.RandomState(0)
    b, k, h = 8, 2048, 16
    for sizes, f in [((128, 128), 4), ((32, 32, 32), 4), ((64, 64), 16),
                     ((16, 16, 16), 16), ((16, 16), 16), ((8, 8, 8), 32)]:
        dim = len(sizes)
        r = b * h
        keys = jnp.asarray(
            rng.uniform(0, np.array(sizes) - 1.001, (r, k, dim)),
            jnp.float32)
        x0, lane0, w_lo, w_hi = jax.jit(
            ps.vertex_decomposition, static_argnames="sizes")(
                keys, tuple(sizes))
        vals = jnp.asarray(rng.randn(r, k, f), jnp.float32)
        kern = jnp.asarray(
            rng.randn(*((3,) * dim + (f, h * f))), jnp.float32) * 0.1
        bias = jnp.asarray(rng.randn(h * f), jnp.float32) * 0.1

        @jax.jit
        def seq(x0, lane0, w_lo, w_hi, vals, kern, bias):
            gk = ps.pallas_splat(x0, lane0, w_lo, w_hi, vals, tuple(sizes),
                                 f, kernel_layout_out=True)
            gk2 = pgc._grid_conv(tuple(sizes), f, h, gk, kern, bias)
            return ps.pallas_slice(x0, lane0, w_lo, w_hi, gk2, tuple(sizes),
                                   f, kernel_layout_in=True)

        d_seq = measure(seq, x0, lane0, w_lo, w_hi, vals, kern, bias)
        d_fus = measure(lambda: pallas_fused_block(
            x0, lane0, w_lo, w_hi, vals, kern, bias, tuple(sizes), f, h)[0])
        a = np.asarray(seq(x0, lane0, w_lo, w_hi, vals, kern, bias))
        c = np.asarray(pallas_fused_block(
            x0, lane0, w_lo, w_hi, vals, kern, bias, tuple(sizes), f, h)[0])
        print(f"{str(sizes):>14} F={f:>2}: seq {d_seq*1e3:6.2f} ms  "
              f"fused {d_fus*1e3:6.2f} ms  "
              f"match={np.allclose(a, c, atol=1e-4)}", flush=True)


def model_ab():
    import jax
    import jax.numpy as jnp
    import cloud_transformers_tpu.nn.grouped_conv as gc
    from cloud_transformers_tpu.models import get_model

    model = get_model("scanobject_classifier", n_classes=15)
    pcd = jax.random.normal(jax.random.PRNGKey(0), (8, 2048, 3))
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           pcd, train=False))()
    for mode in ("ops", "fused", "ops"):
        gc.set_block_fusion(mode)
        fwd = jax.jit(lambda v, x: model.apply(v, x, train=False)[0])
        d = measure(fwd, variables, pcd)

        def loss(v, x):
            return jnp.sum(model.apply(v, x, train=False)[0] ** 2)
        db = measure(jax.jit(jax.value_and_grad(loss)), variables, pcd,
                     iters=5)
        print(f"{mode:>6}: fwd {d*1e3:6.1f} ms ({8/d:5.1f} clouds/s)   "
              f"fwd+bwd {db*1e3:6.1f} ms", flush=True)
    gc.set_block_fusion(None)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", action="store_true")
    args = ap.parse_args()
    if args.model:
        model_ab()
    else:
        standalone()
