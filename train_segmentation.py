#!/usr/bin/env python
"""Train the S3DIS 1x1-protocol segmenter (reference:
/root/reference/train_segmentation.py)."""

import argparse

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("exp_name")
    ap.add_argument("-c", "--config", default="configs/s3dis.yaml")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    args = ap.parse_args()
    if args.coordinator:
        from cloud_transformers_tpu.parallel.distributed import (
            distributed_init)
        distributed_init(args.coordinator, args.num_processes,
                         args.process_id)

    from cloud_transformers_tpu.tasks import segmentation
    from cloud_transformers_tpu.train.config import load_config, model_from_config
    from cloud_transformers_tpu.train.trainer import Trainer

    cfg = load_config(args.config)
    model = model_from_config(cfg)
    train_loader, val_loader = segmentation.make_datasets(
        cfg, synthetic=args.synthetic)
    sample = next(iter(train_loader))
    n_classes = cfg["model"].get("n_classes", 13)
    loss_fn = segmentation.make_loss_fn(
        n_classes=n_classes,
        label_smooth=0.1 if cfg["train"].get("label_smooth") else 0.0)
    trainer = Trainer(model, cfg, args.exp_name, loss_fn,
                      sample_args=(jax.numpy.asarray(sample["pcd"]),),
                      config_path=args.config)

    acc = segmentation.SegEvalAccumulator(n_classes)
    cfg["train"].setdefault("best_metric", "miou")
    trainer.fit(train_loader, val_loader, eval_hook=acc,
                max_steps=args.steps)
    if val_loader is not None:
        print(acc.compute())


if __name__ == "__main__":
    main()
