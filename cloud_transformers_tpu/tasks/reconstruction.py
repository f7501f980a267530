"""Single-view reconstruction task (image -> cloud, EMD training loss).

Reference: /root/reference/train_image_reconstruction.py — sphere-noise input
cloud matching the GT point count, loss = mean(sqrt(EMD(recon, gt, 0.005,
50))) (:168-175), chamfer_adj monitored without gradient (:177-178),
best checkpoint on lowest val EMD (:257-266); eval is merged-2-pass
F-score@0.01 (eval_reconstruction_f1.py:94-126).
"""

import jax
import jax.numpy as jnp

from cloud_transformers_tpu.core.noise import sphere_noise
from cloud_transformers_tpu.data import DataLoader, ImageToPoint
from cloud_transformers_tpu.losses import emd_auction, loss_chamfer_adj


def make_loss_fn(emd_eps=0.005, emd_iters=50):
    def loss_fn(apply_fn, variables, batch, rng, train):
        k_noise, k_drop = jax.random.split(rng)
        gt = batch["pcd"]
        noise = sphere_noise(k_noise, gt.shape[0], gt.shape[1])
        out, updates = apply_fn(
            variables, noise, batch["image"], train=train,
            rngs={"dropout": k_drop}, mutable=["batch_stats"])
        recon, stats = out
        dist, _ = emd_auction(recon, gt, eps=emd_eps, iters=emd_iters)
        loss = jnp.mean(jnp.sqrt(dist + 1e-12))
        cham = jax.lax.stop_gradient(loss_chamfer_adj(recon, gt))
        aux = {"loss_chamfer": cham,
               "occupancy_mean": jnp.mean(
                   jnp.stack([s["occupancy"] for s in stats]))}
        return loss, aux, updates.get("batch_stats",
                                      variables.get("batch_stats", {}))
    return loss_fn


def make_mesh_hook(max_clouds=4):
    """Periodic TB point-cloud logging (recon vs gt) during reconstruction
    training — observability parity with train_inpainter.py:236-243."""
    import numpy as np

    def hook(trainer, batch):
        gt = jnp.asarray(batch["pcd"])[:max_clouds]
        noise = sphere_noise(jax.random.PRNGKey(trainer.global_step),
                             gt.shape[0], gt.shape[1])
        variables = {"params": trainer.state.params,
                     "batch_stats": trainer.state.batch_stats}
        recon, _stats = trainer.state.apply_fn(
            variables, noise, jnp.asarray(batch["image"])[:max_clouds],
            train=False)
        trainer.metrics.mesh(trainer.global_step, "train/recon",
                             np.asarray(recon))
        trainer.metrics.mesh(trainer.global_step, "train/gt", np.asarray(gt))
    return hook


def make_datasets(cfg, synthetic=False):
    d = cfg["data"]
    path = None if synthetic else d.get("path")
    common = dict(im_size=d.get("im_size", 128),
                  points=d.get("gt_size", 8192))
    train_ds = ImageToPoint(path, split="train", **common)
    val_ds = ImageToPoint(path, split="val", seed=1, **common)
    workers = int(d.get("num_workers", 0))
    train_loader = DataLoader(train_ds, d["batch_size"], shuffle=True,
                              num_workers=workers,
                              process_index=jax.process_index(),
                              process_count=jax.process_count())
    val_loader = DataLoader(val_ds, d.get("batch_size_val", d["batch_size"]),
                            shuffle=False, num_workers=workers,
                            process_index=jax.process_index(),
                            process_count=jax.process_count())
    return train_loader, val_loader
