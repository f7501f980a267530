"""ScanObjectNN classification task: losses, metrics, dataset wiring.

Reference: /root/reference/train_classification.py — loss =
(1 - seg_weight) * CE(class) + seg_weight * BCE(per-point mask)
(train_classification.py:201-204); metrics overall acc, mean per-class acc,
mask seg acc (:347-350).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cloud_transformers_tpu.data import DataLoader, ScanObjectNN
from cloud_transformers_tpu.utils.metrics import ConfusionAccumulator


def make_loss_fn(seg_weight=0.5):
    def loss_fn(apply_fn, variables, batch, rng, train):
        out, updates = apply_fn(
            variables, batch["pcd"], train=train,
            rngs={"dropout": rng}, mutable=["batch_stats"])
        class_pred, mask_pred, stats = out
        cls_loss = optax.softmax_cross_entropy_with_integer_labels(
            class_pred, batch["label"]).mean()
        seg_loss = optax.sigmoid_binary_cross_entropy(
            mask_pred[..., 0], batch["mask"]).mean()
        loss = (1.0 - seg_weight) * cls_loss + seg_weight * seg_loss
        pred = jnp.argmax(class_pred, axis=-1)
        aux = {
            "loss_cls": cls_loss,
            "loss_seg": seg_loss,
            "cls_acc": jnp.mean((pred == batch["label"]).astype(jnp.float32)),
            "seg_acc": jnp.mean(((mask_pred[..., 0] > 0)
                                 == (batch["mask"] > 0.5)).astype(jnp.float32)),
            "occupancy_mean": jnp.mean(
                jnp.stack([s["occupancy"] for s in stats])),
            "pred": pred,
        }
        return loss, aux, updates.get("batch_stats", variables.get(
            "batch_stats", {}))
    return loss_fn


def make_datasets(cfg, synthetic=False):
    d = cfg["data"]
    path = None if synthetic else d.get("path")
    path_val = None if synthetic else d.get("path_val")
    train_ds = ScanObjectNN(path, center=d.get("center", True),
                            normalize=d.get("normalize", True), train=True,
                            num_points=d.get("num_points", 2048))
    val_ds = ScanObjectNN(path_val, center=d.get("center", True),
                          normalize=d.get("normalize", True), train=False,
                          num_points=d.get("num_points", 2048), seed=1)
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


class ClassEvalAccumulator:
    """Per-class accuracy accumulation (train_classification.py:337-350).

    Plugged into Trainer.validate as the eval hook: its compute() overrides
    the batch-mean cls_acc with the exact pooled OA and adds m_acc, which
    gates the reference's ``macc_best`` checkpoint
    (train_classification.py:362-374)."""

    def __init__(self, n_classes):
        self.n_classes = n_classes
        self.cm = ConfusionAccumulator(n_classes)

    def reset(self):
        self.cm = ConfusionAccumulator(self.n_classes)

    def __call__(self, batch, metrics):
        self.cm.update(metrics["pred"], batch["label"])

    def compute(self):
        m = self.cm.compute()
        return {"cls_acc": float(m["oa"]), "m_acc": float(m["macc"])}
