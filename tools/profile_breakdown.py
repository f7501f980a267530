#!/usr/bin/env python
"""Op-level time breakdown of the classifier forward / train step.

Captures a jax.profiler trace on the real chip and parses the xplane with
xprof to print per-op self-time, grouped into buckets (pallas splat/slice
kernels, convolutions, layout/transpose prep, everything else).  Used to
attribute the gap between the measured kernel floor and the end-to-end
latency targets (ROADMAP: classifier fwd 150 ms, train step 1.0 s).

Usage: python tools/profile_breakdown.py [fwd|step] [batch]
"""

import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from collections import defaultdict

import numpy as np


def capture(fn, *args, iters=5):
    import jax

    # warmup/compile outside the trace
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).sum()
    tmp = tempfile.mkdtemp(prefix="jaxprof_")
    with jax.profiler.trace(tmp):
        for _ in range(iters):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).sum()
    return tmp


def summarize(logdir, iters):
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print("no xplane captured"); return
    from xprof.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data(paths, "op_profile", {})
    import json
    prof = json.loads(data) if isinstance(data, (str, bytes)) else data

    # walk the op-profile tree: byProgram -> programs -> ... collect leaves
    leaves = []

    def walk(node, depth=0):
        m = node.get("metrics", {})
        ch = node.get("children", [])
        if not ch and m:
            leaves.append((node.get("name", "?"), m))
        for c in ch:
            walk(c, depth + 1)

    root = prof.get("byCategory") or prof.get("byProgram") or prof
    walk(root)
    total = sum(m.get("rawTime", m.get("time", 0.0)) for _, m in leaves)

    buckets = defaultdict(float)
    names = defaultdict(float)
    for name, m in leaves:
        t = m.get("rawTime", m.get("time", 0.0))
        low = name.lower()
        if "splat" in low or "slice" in low or "pallas" in low \
                or "custom-call" in low:
            b = "pallas-kernels"
        elif "conv" in low or "dot" in low or "fusion" in low and "conv" in low:
            b = "conv/matmul"
        elif "transpose" in low or "copy" in low or "reshape" in low \
                or "bitcast" in low:
            b = "layout/copy"
        elif "fusion" in low:
            b = "fusion(elementwise)"
        else:
            b = "other"
        buckets[b] += t
        names[name] += t

    print(f"\ntotal device time: {total:.3f} (prof units) over {iters} iters")
    print("\n-- buckets --")
    for b, t in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"{t/total*100:6.2f}%  {b}")
    print("\n-- top 25 ops --")
    for n, t in sorted(names.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{t/total*100:6.2f}%  {n[:100]}")


def build_fwd(batch=8):
    import jax
    from cloud_transformers_tpu.models import get_model

    model = get_model("scanobject_classifier", n_classes=15)
    pcd = jax.random.normal(jax.random.PRNGKey(0), (batch, 2048, 3))
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           pcd, train=False))()
    fwd = jax.jit(lambda v, p: model.apply(v, p, train=False)[0])
    return fwd, (variables, pcd)


def build_step(batch=8):
    import jax
    import jax.numpy as jnp
    import optax
    from cloud_transformers_tpu.models import get_model

    model = get_model("scanobject_classifier", n_classes=15)
    pcd = jax.random.normal(jax.random.PRNGKey(0), (batch, 2048, 3))
    labels = jnp.zeros((batch,), jnp.int32)
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           pcd, train=True))()
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def loss_fn(p, bs, x, y):
        out, upd = model.apply({"params": p, "batch_stats": bs}, x,
                               train=True, mutable=["batch_stats"],
                               rngs={"dropout": jax.random.PRNGKey(2)})
        logits = out[0]
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()
        return loss, upd["batch_stats"]

    @jax.jit
    def step(p, bs, os_, x, y):
        (loss, bs2), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p, bs, x, y)
        updates, os2 = tx.update(grads, os_, p)
        return optax.apply_updates(p, updates), bs2, os2, loss

    return step, (params, batch_stats, opt_state, pcd, labels)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "fwd"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    iters = 5
    fn, args = (build_fwd(batch) if which == "fwd"
                else build_step(batch))
    logdir = capture(fn, *args, iters=iters)
    print(f"trace in {logdir}")
    summarize(logdir, iters)


if __name__ == "__main__":
    main()
