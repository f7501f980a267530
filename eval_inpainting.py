#!/usr/bin/env python
"""Evaluate ShapeNet completion: per-category F-score@0.01 + Chamfer x1000.

Reference: /root/reference/eval_inpainting.py:140-233 with the GRNet metric
protocol (utils/grdnet_utils.py:70-129): inputs scaled x2 through the model,
reconstruction /2 against the raw GT.
"""

import argparse
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("exp_name")
    ap.add_argument("-c", "--config", default="configs/inpainting.yaml")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint dir (default: cfg restore.generator)")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--emd", action="store_true",
                    help="also compute protocol EMD (eps=0.004, 3000 iters; "
                         "ref train_inpainter.py:267-269)")
    ap.add_argument("--dump-dir", default=None,
                    help="write per-batch pickles of (noise, partial, recon, "
                         "gt, scores) — ref eval_inpainting.py:195")
    args = ap.parse_args()

    from cloud_transformers_tpu.core.noise import partial_postprocess
    from cloud_transformers_tpu.data import DataLoader, ShapeNetCompletion
    from cloud_transformers_tpu.losses import chamfer_distance, f_score_from_dists
    from cloud_transformers_tpu.losses.emd import emd_auction
    from cloud_transformers_tpu.train.checkpoint import restore_params_only
    from cloud_transformers_tpu.train.config import load_config, model_from_config
    from cloud_transformers_tpu.train.optim import make_optimizer
    from cloud_transformers_tpu.train.state import create_train_state

    cfg = load_config(args.config)
    d = cfg["data"]
    model = model_from_config(cfg)

    ds = ShapeNetCompletion(
        None if args.synthetic else d.get("category_path"),
        d.get("partial_path"), d.get("gt_path"), split="test",
        n_input=d.get("input_size", 2048), n_output=d.get("gt_size", 16384))
    loader = DataLoader(ds, 1, shuffle=False, drop_last=False)

    sample = next(iter(loader))
    gt0 = jnp.asarray(sample["gt"]) * 2.0
    parts0, noise0 = partial_postprocess(
        jax.random.PRNGKey(0), jnp.asarray(sample["partial"]) * 2.0,
        gt0.shape[1])
    tx = make_optimizer(cfg["train"]) if "optimizer" in cfg["train"] else \
        make_optimizer({"optimizer": {"type": "Adam", "lr": 1e-4}})
    state = create_train_state(model, (noise0, parts0), tx, train=False)
    ckpt = args.ckpt or cfg.get("restore", {}).get("generator")
    if ckpt:
        state = restore_params_only(ckpt, state)

    @jax.jit
    def run(params, batch_stats, noise, parts):
        out, _ = model.apply({"params": params, "batch_stats": batch_stats},
                             noise, parts, train=False,
                             mutable=["batch_stats"])
        return out[0]

    @jax.jit
    def metric(pred, gt):
        d1, d2, _, _ = chamfer_distance(pred, gt)
        f, _, _ = f_score_from_dists(d1, d2, threshold=0.01)
        cd = (jnp.mean(d1, -1) + jnp.mean(d2, -1)) * 1000.0
        return f, cd

    emd_eps = float(cfg["train"].get("val_emd_eps", 0.004))
    emd_iters = int(cfg["train"].get("val_emd_iters", 3000))

    @jax.jit
    def metric_emd(pred, gt):
        # protocol EMD on 2x-scaled clouds, sqrt-mean, as in the reference
        # val loop (train_inpainter.py:267-272)
        dist, _ = emd_auction(pred * 2.0, gt * 2.0, eps=emd_eps,
                              iters=emd_iters)
        return jnp.mean(jnp.sqrt(dist + 1e-12), axis=-1)

    if args.dump_dir:
        import os
        import pickle
        os.makedirs(args.dump_dir, exist_ok=True)

    per_cat = defaultdict(lambda: {"f": [], "cd": [], "emd": []})
    rng = jax.random.PRNGKey(1)
    for i, batch in enumerate(loader):
        if args.limit and i >= args.limit:
            break
        rng, k = jax.random.split(rng)
        gt = jnp.asarray(batch["gt"])
        parts, noise = partial_postprocess(
            k, jnp.asarray(batch["partial"]) * 2.0, gt.shape[1])
        recon = run(state.params, state.batch_stats, noise, parts) / 2.0
        f, cd = metric(recon, gt)
        cat = int(batch["taxonomy"][0])
        per_cat[cat]["f"].append(float(f[0]))
        per_cat[cat]["cd"].append(float(cd[0]))
        if args.emd:
            per_cat[cat]["emd"].append(float(metric_emd(recon, gt)[0]))
        if args.dump_dir:
            with open(f"{args.dump_dir}/batch_{i:05d}.pkl", "wb") as fh:
                pickle.dump({
                    "noise": np.asarray(noise),
                    "partial": np.asarray(batch["partial"]),
                    "recon": np.asarray(recon),
                    "gt": np.asarray(gt),
                    "taxonomy": cat,
                    "f_score": float(f[0]),
                    "cd": float(cd[0]),
                    "emd": (per_cat[cat]["emd"][-1] if args.emd else None),
                }, fh)

    hdr = "Taxonomy\t#Sample\tF-Score\tChamferDistance"
    print(hdr + ("\tEMD" if args.emd else ""))
    all_f, all_cd, all_emd = [], [], []
    for cat, m in sorted(per_cat.items()):
        row = (f"{cat}\t{len(m['f'])}\t{np.mean(m['f']):.4f}"
               f"\t{np.mean(m['cd']):.4f}")
        if args.emd:
            row += f"\t{np.mean(m['emd']):.4f}"
            all_emd += m["emd"]
        print(row)
        all_f += m["f"]
        all_cd += m["cd"]
    last = f"Overall\t\t{np.mean(all_f):.4f}\t{np.mean(all_cd):.4f}"
    if args.emd:
        last += f"\t{np.mean(all_emd):.4f}"
    print(last)


if __name__ == "__main__":
    main()
