"""ShapeNet completion task (EMD + Chamfer losses on 16k-point clouds).

Reference: /root/reference/train_inpainter.py — gt scaled x2, partial clouds
preprocessed to labeled sphere-noise decoder inputs (:178-183), loss =
mean(sqrt(EMD(recon, gt, 0.005, 50))) + chamfer_weight * loss_chamfer
(:187-192); validation uses EMD(0.004, 3000) (:267-269).
"""

import jax
import jax.numpy as jnp

from cloud_transformers_tpu.core.noise import partial_postprocess
from cloud_transformers_tpu.data import DataLoader, ShapeNetCompletion
from cloud_transformers_tpu.losses import emd_auction, loss_chamfer


def make_loss_fn(chamfer_weight=0.0, emd_eps=0.005, emd_iters=50,
                 gt_scale=2.0):
    def loss_fn(apply_fn, variables, batch, rng, train):
        k_prep, k_drop = jax.random.split(rng)
        gt = batch["gt"] * gt_scale  # train_inpainter.py:178
        parts, noise = partial_postprocess(k_prep, batch["partial"],
                                           gt.shape[1])
        out, updates = apply_fn(
            variables, noise, parts, train=train,
            rngs={"dropout": k_drop}, mutable=["batch_stats"])
        recon, stats = out
        dist, _ = emd_auction(recon, gt, eps=emd_eps, iters=emd_iters)
        emd_loss = jnp.mean(jnp.sqrt(dist + 1e-12))
        loss = emd_loss
        aux = {"loss_emd": emd_loss}
        if chamfer_weight:
            cham = loss_chamfer(recon, gt)
            loss = loss + chamfer_weight * cham
            aux["loss_chamfer"] = cham
        aux["occupancy_mean"] = jnp.mean(
            jnp.stack([s["occupancy"] for s in stats]))
        return loss, aux, updates.get("batch_stats",
                                      variables.get("batch_stats", {}))
    return loss_fn


def make_mesh_hook(gt_scale=2.0, max_clouds=4):
    """Periodic TB point-cloud logging during completion training
    (reference: writer.add_mesh of recon/gt every 30 batches,
    train_inpainter.py:236-243).  Runs an eval-mode forward on the first
    ``max_clouds`` items of the current batch."""
    import numpy as np

    def hook(trainer, batch):
        gt = jnp.asarray(batch["gt"])[:max_clouds] * gt_scale
        parts, noise = partial_postprocess(
            jax.random.PRNGKey(trainer.global_step),
            jnp.asarray(batch["partial"])[:max_clouds], gt.shape[1])
        variables = {"params": trainer.state.params,
                     "batch_stats": trainer.state.batch_stats}
        recon, _stats = trainer.state.apply_fn(variables, noise, parts,
                                               train=False)
        trainer.metrics.mesh(trainer.global_step, "train/recon",
                             np.asarray(recon))
        trainer.metrics.mesh(trainer.global_step, "train/gt", np.asarray(gt))
        trainer.metrics.mesh(trainer.global_step, "train/partial_input",
                             np.asarray(parts)[..., :3])
    return hook


def make_datasets(cfg, synthetic=False):
    d = cfg["data"]
    common = dict(n_input=d.get("input_size", 2048),
                  n_output=d.get("gt_size", 16384))
    if synthetic:
        train_ds = ShapeNetCompletion(split="train",
                                      n_renders=d.get("n_renders", 8),
                                      **common)
        val_ds = ShapeNetCompletion(split="val", **common)
    else:
        train_ds = ShapeNetCompletion(d.get("category_path"),
                                      d.get("partial_path"),
                                      d.get("gt_path"), split="train",
                                      n_renders=d.get("n_renders", 8),
                                      **common)
        val_ds = ShapeNetCompletion(d.get("category_path"),
                                    d.get("partial_path"), d.get("gt_path"),
                                    split="val", **common)
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
