#!/usr/bin/env python
"""Train the single-view reconstructor (reference:
/root/reference/train_image_reconstruction.py)."""

import argparse

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("exp_name")
    ap.add_argument("-c", "--config", default="configs/reconstruction.yaml")
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

    from cloud_transformers_tpu.core.noise import sphere_noise
    from cloud_transformers_tpu.tasks import reconstruction
    from cloud_transformers_tpu.train.config import load_config, model_from_config
    from cloud_transformers_tpu.train.trainer import Trainer

    cfg = load_config(args.config)
    model = model_from_config(cfg)
    train_loader, val_loader = reconstruction.make_datasets(
        cfg, synthetic=args.synthetic)
    sample = next(iter(train_loader))
    loss_fn = reconstruction.make_loss_fn()
    noise = sphere_noise(jax.random.PRNGKey(0), sample["pcd"].shape[0],
                         sample["pcd"].shape[1])
    trainer = Trainer(model, cfg, args.exp_name, loss_fn,
                      sample_args=(noise, jax.numpy.asarray(sample["image"])),
                      config_path=args.config)
    trainer.fit(train_loader, val_loader, max_steps=args.steps,
                mesh_hook=reconstruction.make_mesh_hook())


if __name__ == "__main__":
    main()
