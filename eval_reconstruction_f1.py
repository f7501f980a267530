#!/usr/bin/env python
"""Evaluate single-view reconstruction: per-class F-score@0.01.

Reference: /root/reference/eval_reconstruction_f1.py — two independent
2x4096-point sphere-noise draws, two forward passes, merged prediction
resampled to the 10k GT size, F/precision/recall at 0.01
(utils/f1_metric.py:65-90 get_f1_scores_merge).
"""

import argparse
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("exp_name")
    ap.add_argument("-c", "--config", default="configs/reconstruction.yaml")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--points", type=int, default=10000,
                    help="GT size (eval_reconstruction_f1.py:49-52)")
    args = ap.parse_args()

    from cloud_transformers_tpu.core.noise import sphere_noise
    from cloud_transformers_tpu.data import DataLoader, ImageToPoint
    from cloud_transformers_tpu.losses import f_score
    from cloud_transformers_tpu.train.checkpoint import restore_params_only
    from cloud_transformers_tpu.train.config import load_config, model_from_config
    from cloud_transformers_tpu.train.optim import make_optimizer
    from cloud_transformers_tpu.train.state import create_train_state

    cfg = load_config(args.config)
    d = cfg["data"]
    model = model_from_config(cfg)

    ds = ImageToPoint(None if args.synthetic else d.get("path"),
                      split="test", im_size=d.get("im_size", 128),
                      points=args.points)
    loader = DataLoader(ds, d.get("batch_size_val", 4), shuffle=False,
                        drop_last=False)

    sample = next(iter(loader))
    n_half = 4096 * 2  # two 8192-point passes (eval_reconstruction_f1.py:98)
    noise0 = sphere_noise(jax.random.PRNGKey(0), sample["image"].shape[0],
                          n_half)
    tx = make_optimizer({"optimizer": {"type": "Adam", "lr": 1e-4}})
    state = create_train_state(
        model, (noise0, jnp.asarray(sample["image"])), tx, train=False)
    ckpt = args.ckpt or cfg.get("restore", {}).get("generator")
    if ckpt:
        state = restore_params_only(ckpt, state)

    @jax.jit
    def run(params, batch_stats, noise, image):
        out, _ = model.apply({"params": params, "batch_stats": batch_stats},
                             noise, image, train=False,
                             mutable=["batch_stats"])
        return out[0]

    rng = jax.random.PRNGKey(1)
    per_class = defaultdict(lambda: {"f": [], "p": [], "r": []})
    for i, batch in enumerate(loader):
        if args.limit and i >= args.limit:
            break
        rng, k1, k2, k3 = jax.random.split(rng, 4)
        img = jnp.asarray(batch["image"])
        b = img.shape[0]
        r1 = run(state.params, state.batch_stats,
                 sphere_noise(k1, b, n_half), img)
        r2 = run(state.params, state.batch_stats,
                 sphere_noise(k2, b, n_half), img)
        merged = jnp.concatenate([r1, r2], axis=1)  # [B, 2*n_half, 3]
        # resample merged prediction to the GT size
        idx = jax.random.choice(k3, merged.shape[1],
                                shape=(args.points,), replace=False)
        merged = merged[:, idx]
        f, p, r = f_score(merged, jnp.asarray(batch["pcd"]), threshold=0.01)
        for ib in range(b):
            c = int(batch["class_id"][ib])
            per_class[c]["f"].append(float(f[ib]))
            per_class[c]["p"].append(float(p[ib]))
            per_class[c]["r"].append(float(r[ib]))

    print("class\t#\tF\tprec\trecall")
    for c, m in sorted(per_class.items()):
        name = ds.class_names[c] if c < len(ds.class_names) else str(c)
        print(f"{name}\t{len(m['f'])}\t{np.mean(m['f']):.4f}"
              f"\t{np.mean(m['p']):.4f}\t{np.mean(m['r']):.4f}")
    allf = [v for m in per_class.values() for v in m["f"]]
    print(f"mean F: {np.mean(allf):.4f}")


if __name__ == "__main__":
    main()
