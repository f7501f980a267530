#!/usr/bin/env python
"""Classifier train-step wall time, f32 vs bf16 MXU policy, on the real chip.

Also reports the f32-vs-bf16 gradient agreement (global cosine over all
parameter grads) to justify the bf16 policy as a production *training*
config, not just inference.

Usage: python tools/train_step_bench.py [--iters 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_step(policy):
    import jax
    import jax.numpy as jnp
    import optax
    from cloud_transformers_tpu.models import get_model
    from cloud_transformers_tpu.nn.precision import set_default_mxu_dtype

    set_default_mxu_dtype(policy)
    try:
        model = get_model("scanobject_classifier", n_classes=15)
        pcd = jax.random.normal(jax.random.PRNGKey(0), (8, 2048, 3))
        labels = jnp.zeros((8,), jnp.int32)
        variables = jax.jit(
            lambda: model.init({"params": jax.random.PRNGKey(0),
                                "dropout": jax.random.PRNGKey(1)},
                               pcd, train=True))()
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        tx = optax.adam(1e-3)
        opt_state = tx.init(params)

        def loss_fn(p, bs, x, y):
            out, upd = model.apply(
                {"params": p, "batch_stats": bs}, x, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(2)})
            logits = out[0]
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
            return loss, upd["batch_stats"]

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        @jax.jit
        def step(p, bs, os_, x, y):
            (loss, bs2), grads = grad_fn(p, bs, x, y)
            updates, os2 = tx.update(grads, os_, p)
            return optax.apply_updates(p, updates), bs2, os2, loss, grads

        state = (params, batch_stats, opt_state)
        return step, state, (pcd, labels)
    finally:
        set_default_mxu_dtype(None)


def main():
    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    grads = {}
    for policy in (None, "bfloat16"):
        step, (p, bs, os_), (x, y) = build_step(policy)
        # warmup/compile + capture grads for the agreement check
        p2, bs2, os2, loss, g = step(p, bs, os_, x, y)
        np.asarray(loss)
        grads[policy] = jax.device_get(g)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            p2, bs2, os2, loss, g = step(p2, bs2, os2, x, y)
        np.asarray(loss)  # host readback forces completion on this runtime
        dt = (time.perf_counter() - t0) / args.iters
        name = policy or "float32"
        print(f"train_step[{name}]: {dt*1e3:.1f} ms  (loss {float(loss):.4f})")

    a = np.concatenate([np.asarray(l).ravel()
                        for l in jax.tree_util.tree_leaves(grads[None])])
    b = np.concatenate([np.asarray(l).ravel()
                        for l in jax.tree_util.tree_leaves(grads["bfloat16"])])
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))
    print(f"grad agreement f32-vs-bf16: cosine={cos:.6f} "
          f"max|d|={np.abs(a-b).max():.3e}")


if __name__ == "__main__":
    main()
