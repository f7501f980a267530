"""S3DIS 1x1-protocol segmentation task.

Reference: /root/reference/train_segmentation.py — per-point cross-entropy
(optionally label-smoothed), confusion-matrix OA/mAcc/mIoU on Area-5
(iou_util_new.py:130-145).
"""

import jax
import jax.numpy as jnp
import optax

from cloud_transformers_tpu.data import DataLoader, Indoor3DSemSeg
from cloud_transformers_tpu.utils.metrics import ConfusionAccumulator


def make_loss_fn(n_classes=13, label_smooth=0.0):
    def loss_fn(apply_fn, variables, batch, rng, train):
        out, updates = apply_fn(
            variables, batch["pcd"], train=train,
            rngs={"dropout": rng}, mutable=["batch_stats"])
        logits, stats = out
        labels = batch["label"]
        if label_smooth:
            onehot = optax.smooth_labels(
                jax.nn.one_hot(labels, n_classes), label_smooth)
            loss = optax.softmax_cross_entropy(logits, onehot).mean()
        else:
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
        pred = jnp.argmax(logits, axis=-1)
        aux = {
            "acc": jnp.mean((pred == labels).astype(jnp.float32)),
            "occupancy_mean": jnp.mean(
                jnp.stack([s["occupancy"] for s in stats])),
            "pred": pred,
        }
        return loss, aux, updates.get("batch_stats",
                                      variables.get("batch_stats", {}))
    return loss_fn


def make_datasets(cfg, synthetic=False):
    d = cfg["data"]
    path = None if synthetic else d.get("path")
    kwargs = dict(num_points=d.get("num_points", 4096),
                  test_area=d.get("test_area", "Area_5"))
    train_ds = Indoor3DSemSeg(path, train=True, aug=d.get("aug", True),
                              data_percent=d.get("data_percent", 1.0),
                              aug_elastic=d.get("aug_elastic", False),
                              aug_dropout=d.get("aug_dropout", False),
                              **kwargs)
    val_ds = Indoor3DSemSeg(path, train=False, aug=False, **kwargs)
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


class SegEvalAccumulator:
    """Streaming confusion matrix -> OA / mAcc / per-class IoU / mIoU."""

    def __init__(self, n_classes=13):
        self.n_classes = n_classes
        self.cm = ConfusionAccumulator(n_classes)

    def reset(self):
        self.cm = ConfusionAccumulator(self.n_classes)

    def __call__(self, batch, metrics):
        self.cm.update(metrics["pred"], batch["label"])

    def compute(self):
        m = self.cm.compute()
        return {"oa": float(m["oa"]), "macc": float(m["macc"]),
                "miou": float(m["miou"]),
                **{f"iou_{i}": float(v) for i, v in enumerate(m["iou"])}}
