#!/usr/bin/env python
"""Evaluate the KPConv-protocol segmenter: 20-vote test-time augmentation,
mIoU at part / sub-cloud / full-cloud granularity.

Reference: /root/reference/eval_segmentation_kpconv.py (validate with
num_votes=20, s3dis_closer_train.py:70-178).
"""

import argparse

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("exp_name")
    ap.add_argument("-c", "--config", default="configs/s3dis_kpconv.yaml")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--num-votes", type=int, default=20)
    args = ap.parse_args()

    from cloud_transformers_tpu.data import DataLoader
    from cloud_transformers_tpu.data.s3dis_kpconv import S3DISSeg
    from cloud_transformers_tpu.tasks import segmentation_kpconv as task
    from cloud_transformers_tpu.train.checkpoint import restore_params_only
    from cloud_transformers_tpu.train.config import load_config, model_from_config
    from cloud_transformers_tpu.train.logging import setup_logger
    from cloud_transformers_tpu.train.optim import make_optimizer
    from cloud_transformers_tpu.train.state import create_train_state

    cfg = load_config(args.config)
    d = cfg["data"]
    model = model_from_config(cfg)
    logger = setup_logger()

    val_ds = S3DISSeg(
        split="val",
        input_features_dim=d.get("input_features_dim", 4),
        subsampling_parameter=d.get("sampleDl", 0.04),
        in_radius=d.get("in_radius", 2.0),
        num_points=d.get("num_points", 8192),
        num_steps=d.get("num_steps", 2000),
        num_epochs=20,
        data_root=None if args.synthetic else d.get("path"))
    loader = DataLoader(val_ds, d.get("batch_size_val", d["batch_size"]),
                        shuffle=False)

    import jax.numpy as jnp
    sample = next(iter(loader))
    tx = make_optimizer({"optimizer": {"type": "Adam", "lr": 1e-3}})
    state = create_train_state(
        model, (jnp.asarray(sample["points"]), jnp.asarray(sample["mask"]),
                jnp.asarray(sample["features"])), tx, train=False)
    ckpt = args.ckpt or cfg.get("restore", {}).get("generator")
    if ckpt:
        state = restore_params_only(ckpt, state)

    loss_fn = task.make_loss_fn()

    @jax.jit
    def eval_step_jit(params, batch_stats, points, mask, features, label):
        batch = {"points": points, "mask": mask, "features": features,
                 "label": label}
        _, aux, _ = loss_fn(
            model.apply, {"params": params, "batch_stats": batch_stats},
            batch, jax.random.PRNGKey(0), False)
        return aux

    def eval_step(batch):
        return eval_step_jit(state.params, state.batch_stats,
                             jnp.asarray(batch["points"]),
                             jnp.asarray(batch["mask"]),
                             jnp.asarray(batch["features"]),
                             jnp.asarray(batch["label"]))

    results = task.validate_votes(
        eval_step, val_ds, loader,
        num_classes=cfg["model"].get("n_classes", 13),
        num_votes=args.num_votes,
        input_features_dim=d.get("input_features_dim", 4), logger=logger)
    print({k: v for k, v in results.items() if k != "ious"})
    print("per-class IoU:", results["ious"])


if __name__ == "__main__":
    main()
