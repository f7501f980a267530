#!/usr/bin/env python
"""Train the ScanObjectNN classifier.

CLI mirrors the reference (/root/reference/train_classification.py:26-37):
    python train_classification.py EXP_NAME -c configs/scanobjectnn.yaml
Multi-host replaces --master/--rank/--num_nodes with jax.distributed
(--coordinator/--process-id/--num-processes); single-host multi-chip needs no
flags at all (the mesh spans local devices).
"""

import argparse

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("exp_name")
    ap.add_argument("-c", "--config", default="configs/scanobjectnn.yaml")
    ap.add_argument("--synthetic", action="store_true",
                    help="use the synthetic dataset (no files needed)")
    ap.add_argument("--steps", type=int, default=None,
                    help="stop after N optimizer steps (smoke runs)")
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    args = ap.parse_args()

    if args.coordinator:
        from cloud_transformers_tpu.parallel.distributed import (
            distributed_init)
        distributed_init(args.coordinator, args.num_processes,
                         args.process_id)

    from cloud_transformers_tpu.tasks import classification
    from cloud_transformers_tpu.train.config import load_config, model_from_config
    from cloud_transformers_tpu.train.trainer import Trainer

    cfg = load_config(args.config)
    model = model_from_config(cfg)
    train_loader, val_loader = classification.make_datasets(
        cfg, synthetic=args.synthetic)

    sample = next(iter(train_loader))
    loss_fn = classification.make_loss_fn(
        seg_weight=float(cfg["train"].get("seg_weight", 0.5)))
    trainer = Trainer(model, cfg, args.exp_name, loss_fn,
                      sample_args=(jax.numpy.asarray(sample["pcd"]),),
                      config_path=args.config)
    # exact pooled OA + mean per-class acc each validation; gates the
    # 'best' (cls_acc) and 'macc_best' checkpoints (ref :347-374)
    hook = classification.ClassEvalAccumulator(
        int(cfg.get("model", {}).get("n_classes", 15)))
    cfg["train"].setdefault("best_metric", "cls_acc")
    cfg["train"].setdefault("best_metrics", ["m_acc"])
    trainer.fit(train_loader, val_loader, eval_hook=hook,
                max_steps=args.steps)


if __name__ == "__main__":
    main()
