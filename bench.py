#!/usr/bin/env python
"""Benchmark: ScanObjectNN classifier inference throughput (north-star,
BASELINE.md) + fused splat+slice throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

The reference publishes no GPU throughput numbers (BASELINE.md), so
``vs_baseline`` is measured against the recorded value of the previous round
when available (bench_baseline.json), else 1.0.
"""

import json
import os
import sys
import time

import numpy as np

# NOTE: jax's persistent compilation cache was tried here and REVERTED — on
# this tunneled runtime a trivial jit hangs with the cache enabled (and
# cached AOT executables can hit libtpu version mismatches across driver
# restarts, the exact failure mode of the round-1 multichip dryrun).


def measure(fn, *args, iters=20, warmup=3):
    """Time fn. Completion is forced by a host readback of a dependent
    scalar — on this platform's tunneled runtime, block_until_ready can
    return before device execution finishes."""
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


def bench_classifier_inference(batch=8, points=2048, mxu_dtype=None):
    """ScanObjectNN classifier forward.  ``mxu_dtype='bfloat16'`` is the
    production TPU config (PARITY.md: bf16-vs-f32 logits cosine 0.999997,
    top-1 identical); f32 is kept as a row for cross-round comparability."""
    import jax
    from cloud_transformers_tpu.models import get_model
    from cloud_transformers_tpu.nn.precision import set_default_mxu_dtype

    set_default_mxu_dtype(mxu_dtype)
    try:
        model = get_model("scanobject_classifier", n_classes=15)
        pcd = jax.random.normal(jax.random.PRNGKey(0), (batch, points, 3))
        variables = jax.jit(
            lambda: model.init({"params": jax.random.PRNGKey(0),
                                "dropout": jax.random.PRNGKey(1)},
                               pcd, train=False))()
        fwd = jax.jit(lambda v, p: model.apply(v, p, train=False)[0])
        dt = measure(fwd, variables, pcd)
    finally:
        set_default_mxu_dtype(None)
    return batch / dt, dt


def bench_splat_slice(batch=8, points=2048, heads=16, feat=8, size=32):
    """Fused positions+splat+slice round trip, Mpoints/sec (counting each
    cloud point once per head group); mapping API -> Pallas kernel."""
    import jax
    import jax.numpy as jnp
    from cloud_transformers_tpu.core import (grid_mapping, splat_max_mapping,
                                             slice_grid_mapping)

    key = jax.random.PRNGKey(0)
    keys = jnp.tanh(jax.random.normal(key, (batch, points, heads, 3)))
    values = jax.random.normal(key, (batch, points, heads * feat))
    sizes = (size,) * 3

    @jax.jit
    def fused(keys, values):
        m = grid_mapping(keys, sizes, 3)
        grid = splat_max_mapping(m, values, sizes)
        return slice_grid_mapping(m, grid, sizes)

    dt = measure(fused, keys, values)
    return batch * points * heads / dt / 1e6, dt


def bench_reconstructor_inference(batch=8, points=8192, im=128):
    """Image->cloud reconstructor forward (ResNet50 + AdaIN decoder) with
    the bf16 MXU policy — the model family that benefits from it most."""
    import jax
    from cloud_transformers_tpu.models import get_model
    from cloud_transformers_tpu.nn.precision import set_default_mxu_dtype

    set_default_mxu_dtype("bfloat16")
    try:
        model = get_model("image_reconstructor")
        noise = jax.random.normal(jax.random.PRNGKey(0), (batch, points, 3))
        img = jax.random.uniform(jax.random.PRNGKey(1), (batch, im, im, 3))
        variables = jax.jit(
            lambda: model.init({"params": jax.random.PRNGKey(0),
                                "dropout": jax.random.PRNGKey(1)},
                               noise, img, train=False))()
        fwd = jax.jit(lambda v, n, i: model.apply(v, n, i, train=False)[0])
        dt = measure(fwd, variables, noise, img, iters=10)
    finally:
        set_default_mxu_dtype(None)
    return dt


def bench_inpainter_inference(batch=2, points=16384, partial=2048):
    """ShapeNet completion forward (noise [B,P,4] + partial -> cloud) at the
    reference protocol shapes (configs/inpainting.yaml: gt_size=16384,
    input_size=2048, batch 2), bf16 MXU policy."""
    import jax
    from cloud_transformers_tpu.models import get_model
    from cloud_transformers_tpu.nn.precision import set_default_mxu_dtype

    set_default_mxu_dtype("bfloat16")
    try:
        model = get_model("completion_inpainter")
        noise = jax.random.normal(jax.random.PRNGKey(0), (batch, points, 4))
        part = jax.random.normal(jax.random.PRNGKey(1), (batch, partial, 3))
        variables = jax.jit(
            lambda: model.init({"params": jax.random.PRNGKey(0),
                                "dropout": jax.random.PRNGKey(1)},
                               noise, part, train=False))()
        fwd = jax.jit(lambda v, n, p: model.apply(v, n, p, train=False)[0])
        dt = measure(fwd, variables, noise, part, iters=10)
    finally:
        set_default_mxu_dtype(None)
    return dt


def main():
    t_start = time.time()
    # headline: the production TPU config (bf16 MXU policy, verified parity)
    clouds_per_sec, dt_cls = bench_classifier_inference(mxu_dtype="bfloat16")
    _, dt_cls_f32 = bench_classifier_inference(mxu_dtype=None)
    mpts, dt_ss = bench_splat_slice()
    # B=32 scaling point (round-1 anomaly check: must scale ~linearly)
    mpts32, dt_ss32 = bench_splat_slice(batch=32)
    dt_rec = bench_reconstructor_inference()
    dt_inp = bench_inpainter_inference()

    baseline_path = os.path.join(os.path.dirname(__file__),
                                 "bench_baseline.json")
    vs = 1.0
    if os.path.exists(baseline_path):
        try:
            base = json.load(open(baseline_path))
            if base.get("value"):
                vs = clouds_per_sec / float(base["value"])
        except Exception:
            pass

    print(json.dumps({
        "metric": "clouds/sec/chip (ScanObjectNN infer, bf16 prod config)",
        "value": round(clouds_per_sec, 1),
        "unit": "clouds/sec",
        "vs_baseline": round(vs, 3),
        "splat_slice_mpoints_per_sec": round(mpts, 1),
        "splat_slice_mpoints_per_sec_b32": round(mpts32, 1),
        "classifier_ms_per_batch8": round(dt_cls * 1e3, 3),
        "classifier_f32_ms_per_batch8": round(dt_cls_f32 * 1e3, 3),
        "splat_slice_ms": round(dt_ss * 1e3, 3),
        "splat_slice_b32_ms": round(dt_ss32 * 1e3, 3),
        "reconstructor_bf16_ms_per_batch8": round(dt_rec * 1e3, 3),
        "inpainter_bf16_ms_per_batch2_16k": round(dt_inp * 1e3, 3),
        "bench_wall_sec": round(time.time() - t_start, 1),
    }))


if __name__ == "__main__":
    main()
