#!/usr/bin/env python
"""Measure the eval-protocol EMD cost (eps=0.004, iters=3000) on REALISTIC
pred/gt pairs (VERDICT r2 #6).

Random-vs-random clouds never converge and run all 3000 auction rounds
(~18 s / 16k batch).  In the actual completion eval the prediction is a
reconstruction of the gt, so the price war ends quickly.  This tool
simulates reconstruction quality as gt + Gaussian displacement at several
scales (sigma as a fraction of the cloud extent; mid-training completion
models sit around sigma ~ 0.02-0.1), plus the pathological random pair,
and reports auction rounds used + wall time per batch.

Usage: python tools/emd_protocol_cost.py [--points 16384] [--batch 8]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=16384)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--eps", type=float, default=0.004)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from cloud_transformers_tpu.losses import emd_auction
    from cloud_transformers_tpu.losses.emd import emd_auction_with_rounds

    rng = np.random.RandomState(0)
    # gt: unit-cube-ish cloud, like the 0.9-scaled ShapeNet h5s
    gt = rng.rand(args.batch, args.points, 3).astype(np.float32)

    fn = jax.jit(lambda a, b: emd_auction_with_rounds(
        a, b, eps=args.eps, iters=args.iters))

    print(f"| pred quality | rounds used | wall s/batch "
          f"(B={args.batch} x {args.points}) | sqrt-EMD |")
    print("|---|---|---|---|")
    for name, pred in [
            ("sigma=0.01 (late training)", gt + 0.01 * rng.randn(
                *gt.shape).astype(np.float32)),
            ("sigma=0.05 (mid training)", gt + 0.05 * rng.randn(
                *gt.shape).astype(np.float32)),
            ("sigma=0.15 (early training)", gt + 0.15 * rng.randn(
                *gt.shape).astype(np.float32)),
            ("random vs random (worst case)", rng.rand(
                *gt.shape).astype(np.float32)),
    ]:
        pred_j = jnp.asarray(pred)
        gt_j = jnp.asarray(gt)
        dist, _, rounds = fn(pred_j, gt_j)  # warmup/compile
        np.asarray(jnp.sum(dist))
        t0 = time.perf_counter()
        dist, _, rounds = fn(pred_j, gt_j)
        emd = float(np.mean(np.sqrt(np.asarray(dist) + 1e-12)))
        rounds = int(np.asarray(rounds))
        dt = time.perf_counter() - t0
        print(f"| {name} | {rounds} | {dt:.2f} | {emd:.4f} |", flush=True)


if __name__ == "__main__":
    main()
