#!/usr/bin/env python
"""Fixed vs marginal cost of the fused multi-round auction window kernel.

The measurement behind the round-5 rejection of the window tail as default
(losses/emd.py `_WINDOW_TAIL` docstring): per call it reports the 0-round
fixed cost and the marginal in-kernel round cost at W=256/512 against the
B=8 x 16384 protocol shape.  Recorded (v5e, round 5):

    W=256 cap=0: 3.36 ms/call   cap=1: 5.05   cap=8: 6.61 (used=2)
    W=512 cap=0: 3.56 ms/call   cap=1: 5.13   cap=8: 7.60 (used=3)

-> marginal round 1.6 ms (W=256) / 1.2 ms (W=512), vs the dispatched XLA
compacted round at 1.0-1.7 ms (losses/emd.py `_PALLAS_BID_MIN_WIDTH`
table): no dispatch fat to cut; the tail is O(M*W) VPU arithmetic.

Usage: python tools/emd_window_cost.py [--points 16384] [--batch 8]
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from cloud_transformers_tpu.losses.emd import _compact_unassigned
    from cloud_transformers_tpu.ops.pallas_emd import (
        _window_m_tile, pack_col, pack_targets, pallas_auction_window)

    rng = np.random.RandomState(0)
    b, n = args.batch, args.points

    def setup(w):
        m_tile = _window_m_tile(w, n)
        x2 = jnp.asarray(rng.rand(b, n, 3), jnp.float32)
        x1 = jnp.asarray(rng.rand(b, n, 3), jnp.float32)
        idx = _compact_unassigned(jnp.full((b, n), -1, jnp.int32), w)
        j_real = jnp.where(idx < n, idx, n).astype(jnp.int32)
        x1w = jnp.take_along_axis(x1, jnp.minimum(idx, n - 1)[..., None], 1)
        return (x1w, j_real, pack_targets(x2, m_tile),
                pack_col(jnp.zeros((b, n), jnp.float32), m_tile),
                pack_col(jnp.full((b, n), -1, jnp.int32), m_tile, fill=-1))

    def run(w, rounds_cap, k=10):
        x1w, j_real, x2b, prb, invb = setup(w)
        f = jax.jit(lambda p, i: pallas_auction_window(
            x1w, j_real, x2b, p, i, rounds_cap, 0.004, n=n,
            rounds_cap=rounds_cap))
        jax.block_until_ready(f(prb, invb))
        t = time.time()
        outs = [f(prb, invb) for _ in range(k)]
        jax.block_until_ready(outs)
        dt = (time.time() - t) / k
        return dt, int(np.asarray(outs[-1][2]).max())

    for w in (256, 512):
        rows = {cap: run(w, cap) for cap in (0, 1, 8, 64)}
        for cap, (dt, used) in rows.items():
            print(f"W={w} cap={cap}: {dt * 1e3:.2f} ms/call, used={used}")
        d1, u1 = rows[1]
        d8, u8 = rows[8]
        print(f"W={w}: fixed {rows[0][0] * 1e3:.2f} ms, marginal "
              f"{(d8 - d1) / max(u8 - u1, 1) * 1e3:.2f} ms/round")


if __name__ == "__main__":
    main()
