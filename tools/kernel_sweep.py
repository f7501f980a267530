#!/usr/bin/env python
"""Measure splat/slice kernel variants and model-level step times on the
real TPU chip.  Dev tool behind the tuning notes in ops/pallas_splat.py —
re-run after kernel changes to keep the measured claims honest.

Usage: python tools/kernel_sweep.py [--reduce-sweep] [--models] [--units]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _measure(fn, *args, iters=10):
    import jax
    import jax.numpy as jnp
    out = fn(*args)
    np.asarray(jnp.sum(jax.tree_util.tree_leaves(out)[0]))  # force readback
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    return (time.perf_counter() - t0) / iters


def reduce_sweep():
    """slice / splat_bwd / slice_bwd with VPU vs MXU reductions."""
    import jax
    import jax.numpy as jnp
    import cloud_transformers_tpu.ops.pallas_splat as ps

    rng = np.random.RandomState(0)
    r, k, f = 128, 2048, 8
    sizes = (32, 32, 32)
    keys = jnp.asarray(rng.uniform(0, 30.999, (r, k, 3)), jnp.float32)
    x0, lane0, w_lo, w_hi = jax.jit(
        ps.vertex_decomposition, static_argnames="sizes")(keys, sizes)
    vals = jnp.asarray(rng.randn(r, k, f), jnp.float32)
    grid = ps.pallas_splat(x0, lane0, w_lo, w_hi, vals, sizes, f)
    g = jnp.asarray(rng.randn(*np.asarray(grid).shape), jnp.float32)
    gp = jnp.asarray(rng.randn(r, k, f), jnp.float32)

    for lane_red, sub_red in [("vpu", "vpu"), ("mxu", "vpu"),
                              ("vpu", "mxu"), ("mxu", "mxu")]:
        ps._LANE_REDUCE, ps._SUBLANE_REDUCE = lane_red, sub_red
        for fn in (ps.pallas_slice, ps.pallas_splat_bwd, ps.pallas_slice_bwd):
            fn.clear_cache()
        d1 = _measure(lambda: ps.pallas_slice(
            x0, lane0, w_lo, w_hi, grid, sizes, f), iters=20)
        d2 = _measure(lambda: ps.pallas_splat_bwd(
            x0, lane0, w_lo, w_hi, vals, grid, g, sizes, f))
        d3 = _measure(lambda: ps.pallas_slice_bwd(
            x0, lane0, w_lo, w_hi, gp, grid, sizes, f))
        cyc = 0.94e9 / (r * k)
        print(f"lane={lane_red} sub={sub_red}: "
              f"slice {d1*1e3:.2f} ms ({d1*cyc:.1f} c/pt)  "
              f"splat_bwd {d2*1e3:.2f} ms ({d2*cyc:.1f} c/pt)  "
              f"slice_bwd {d3*1e3:.2f} ms ({d3*cyc:.1f} c/pt)", flush=True)


def unit_profile():
    """Fused splat+conv+slice fwd+bwd per classifier head-group unit shape:
    where does the 12-block trunk actually spend its time?"""
    import jax
    import jax.numpy as jnp
    from cloud_transformers_tpu.core import splat_slice as ss
    from cloud_transformers_tpu.core.grid_mapping import grid_mapping

    rng = np.random.RandomState(0)
    b, p = 8, 2048
    # (sizes, heads, feat) per classifier stage plan (models/classifier.py)
    units = [((128, 128), 16, 4), ((64, 64), 16, 16), ((16, 16), 16, 16),
             ((32, 32, 32), 16, 4), ((16, 16, 16), 16, 16),
             ((8, 8, 8), 16, 32)]
    for sizes, h, f in units:
        dim = len(sizes)
        keys = jnp.asarray(rng.uniform(-1, 1, (b, p, h, dim)), jnp.float32)
        vals = jnp.asarray(rng.randn(b, p, h * f), jnp.float32)

        def loss(v, kk):
            m = grid_mapping(kk, sizes, dim)
            grid = ss.splat_max_mapping(m, v, sizes)
            return jnp.sum(ss.slice_grid_mapping(m, grid, sizes) ** 2)

        fwd = jax.jit(lambda v, kk: loss(v, kk))
        fb = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
        d_f = _measure(fwd, vals, keys)
        d_b = _measure(fb, vals, keys)
        print(f"{str(sizes):>14} H={h} F={f:>2}: fwd {d_f*1e3:6.2f} ms  "
              f"fwd+bwd {d_b*1e3:6.2f} ms", flush=True)


def model_bench():
    import jax
    import jax.numpy as jnp
    from cloud_transformers_tpu.models import get_model

    model = get_model("scanobject_classifier", n_classes=15)
    pcd = jax.random.normal(jax.random.PRNGKey(0), (8, 2048, 3))
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           pcd, train=False))()
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False)[0])
    d = _measure(fwd, variables, pcd)
    print(f"classifier fwd batch8: {d*1e3:.1f} ms "
          f"({8 / d:.1f} clouds/s)", flush=True)


def train_step_bench():
    import jax
    import jax.numpy as jnp
    from cloud_transformers_tpu.models import get_model
    from cloud_transformers_tpu.tasks.classification import make_loss_fn
    from cloud_transformers_tpu.train.optim import make_optimizer
    from cloud_transformers_tpu.train.state import create_train_state

    model = get_model("scanobject_classifier", n_classes=15)
    batch = {
        "pcd": np.random.RandomState(0).randn(8, 2048, 3).astype(np.float32),
        "label": np.zeros(8, np.int32),
        "mask": np.ones((8, 2048), np.float32),
    }
    tx = make_optimizer({"optimizer": {"type": "Adam", "lr": 1e-3}})
    state = create_train_state(model, (jnp.asarray(batch["pcd"]),), tx)
    loss_fn = make_loss_fn(0.5)

    def compute(params, batch_stats, batch, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        loss, aux, new_stats = loss_fn(state.apply_fn, variables, batch,
                                       rng, True)
        return loss, (aux, new_stats)

    grad_fn = jax.value_and_grad(compute, has_aux=True)

    @jax.jit
    def train_step(state, batch, rng):
        (loss, (_, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch, rng)
        state = state.apply_gradients(grads=grads)
        return state.replace(batch_stats=new_stats), loss

    rng = jax.random.PRNGKey(0)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    def step():
        nonlocal state
        state, loss = train_step(state, batch, rng)
        return loss

    d = _measure(step, iters=5)
    print(f"train step batch8: {d*1e3:.1f} ms", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reduce-sweep", action="store_true")
    ap.add_argument("--units", action="store_true")
    ap.add_argument("--models", action="store_true")
    args = ap.parse_args()
    if args.reduce_sweep:
        reduce_sweep()
    if args.units:
        unit_profile()
    if args.models:
        model_bench()
        train_step_bench()


if __name__ == "__main__":
    main()
