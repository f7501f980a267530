#!/usr/bin/env python
"""Train the S3DIS segmenter under the KPConv/CloserLook3D protocol.

Reference: /root/reference/train_segmentation_kpconv.py — protocol constants
(2000 steps/epoch, sampleDl 0.04, in_radius 2.0, 8192 pts, 4 feature dims,
train-time rotate/scale-jitter, grad clip 10, final 20-vote validation) are
config defaults here instead of a hardcoded FakeCFG.
"""

import argparse

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("exp_name")
    ap.add_argument("-c", "--config", default="configs/s3dis_kpconv.yaml")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--num-votes", type=int, default=20)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    args = ap.parse_args()
    if args.coordinator:
        from cloud_transformers_tpu.parallel.distributed import (
            distributed_init)
        distributed_init(args.coordinator, args.num_processes,
                         args.process_id)

    from cloud_transformers_tpu.data import DataLoader
    from cloud_transformers_tpu.data.s3dis_kpconv import S3DISSeg
    from cloud_transformers_tpu.tasks import segmentation_kpconv as task
    from cloud_transformers_tpu.train.config import load_config, model_from_config
    from cloud_transformers_tpu.train.trainer import Trainer

    cfg = load_config(args.config)
    d = cfg["data"]
    tcfg = cfg["train"]
    tcfg.setdefault("clip_grad_norm", 10.0)  # s3dis_closer_train.py:51
    model = model_from_config(cfg)

    def train_transform(points, rng=np.random.RandomState(0)):
        return task.batch_rotate_scale_jitter(points[None], rng)[0]

    common = dict(
        input_features_dim=d.get("input_features_dim", 4),
        subsampling_parameter=d.get("sampleDl", 0.04),
        in_radius=d.get("in_radius", 2.0),
        num_points=d.get("num_points", 8192),
        num_steps=d.get("num_steps", 2000),
        num_epochs=tcfg.get("num_epochs", 600),
        data_root=None if args.synthetic else d.get("path"),
    )
    train_ds = S3DISSeg(split="train", color_drop=d.get("color_drop", 0.2),
                        transforms=train_transform, **common)
    val_ds = S3DISSeg(split="val", **common)
    workers = int(d.get("num_workers", 0))
    train_loader = DataLoader(train_ds, d["batch_size"], shuffle=False,
                              num_workers=workers,
                              process_index=jax.process_index(),
                              process_count=jax.process_count())
    val_loader = DataLoader(val_ds, d.get("batch_size_val", d["batch_size"]),
                            shuffle=False, num_workers=workers,
                            process_index=jax.process_index(),
                            process_count=jax.process_count())

    # schedule is pre-randomized; epoch indexing lives in the dataset
    class EpochLoader:
        def __init__(self, loader, ds):
            self.loader, self.ds = loader, ds

        def set_epoch(self, epoch):
            # DataLoader.set_epoch forwards to the dataset already
            self.loader.set_epoch(epoch)

        def __iter__(self):
            return iter(self.loader)

        def __len__(self):
            return len(self.loader)

    loss_fn = task.make_loss_fn()
    sample = next(iter(train_loader))
    trainer = Trainer(model, cfg, args.exp_name, loss_fn,
                      sample_args=(jax.numpy.asarray(sample["points"]),
                                   jax.numpy.asarray(sample["mask"]),
                                   jax.numpy.asarray(sample["features"])),
                      config_path=args.config)
    n_classes = cfg["model"].get("n_classes", 13)

    def epoch_validate(epoch):
        # per-epoch 2-vote validation, as the reference does every val_step
        # epochs (train_segmentation_kpconv.py:254)
        r = task.validate_votes(
            trainer.eval_step, val_ds, val_loader, num_classes=n_classes,
            num_votes=2, input_features_dim=common["input_features_dim"],
            logger=trainer.logger)
        return {k: v for k, v in r.items() if np.ndim(v) == 0}

    trainer.fit(EpochLoader(train_loader, train_ds), val_loader=None,
                max_steps=args.steps,
                epoch_hook=None if args.steps else epoch_validate)

    results = task.validate_votes(
        trainer.eval_step, val_ds, val_loader,
        num_classes=n_classes,
        num_votes=args.num_votes,
        input_features_dim=common["input_features_dim"],
        logger=trainer.logger)
    print({k: v for k, v in results.items() if k != "ious"})


if __name__ == "__main__":
    main()
