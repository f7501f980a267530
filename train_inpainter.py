#!/usr/bin/env python
"""Train the ShapeNet completion model (reference:
/root/reference/train_inpainter.py)."""

import argparse

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("exp_name")
    ap.add_argument("-c", "--config", default="configs/inpainting.yaml")
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

    from cloud_transformers_tpu.core.noise import partial_postprocess
    from cloud_transformers_tpu.tasks import completion
    from cloud_transformers_tpu.train.config import load_config, model_from_config
    from cloud_transformers_tpu.train.trainer import Trainer

    cfg = load_config(args.config)
    model = model_from_config(cfg)
    train_loader, val_loader = completion.make_datasets(
        cfg, synthetic=args.synthetic)
    sample = next(iter(train_loader))
    loss_fn = completion.make_loss_fn(
        chamfer_weight=float(cfg["train"].get("chamfer_weight", 0.0)))
    # validation protocol uses the high-accuracy EMD (train_inpainter.py:267)
    eval_fn = completion.make_loss_fn(
        chamfer_weight=float(cfg["train"].get("chamfer_weight", 0.0)),
        emd_eps=0.004, emd_iters=int(cfg["train"].get("val_emd_iters", 3000)))

    gt = jax.numpy.asarray(sample["gt"]) * 2.0
    parts, noise = partial_postprocess(
        jax.random.PRNGKey(0), jax.numpy.asarray(sample["partial"]),
        gt.shape[1])
    trainer = Trainer(model, cfg, args.exp_name, loss_fn,
                      sample_args=(noise, parts), eval_fn=eval_fn,
                      config_path=args.config)
    # TB point-cloud summaries of recon/gt/partial during training
    # (train_inpainter.py:236-243)
    trainer.fit(train_loader, val_loader, max_steps=args.steps,
                mesh_hook=completion.make_mesh_hook())


if __name__ == "__main__":
    main()
