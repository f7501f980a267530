"""Segmentation / classification metrics, on-device.

Reference protocol: streaming confusion matrix -> overall accuracy, mean class
accuracy, per-class IoU, mIoU (/root/reference/datasets/S3DIS_tools/
iou_util_new.py:12-145, datasets/s3dis_closer_utils.py:252-352).  Keeping the
accumulation on device (one [C, C] array updated per step) avoids the
reference's per-step device-to-host gathers (SURVEY.md §3 boundary note).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("num_classes",))
def confusion_matrix(pred, label, num_classes, valid=None):
    """pred/label int arrays of equal shape -> [C, C] counts
    (rows = true, cols = predicted)."""
    pred = pred.reshape(-1)
    label = label.reshape(-1)
    idx = label * num_classes + pred
    weights = None if valid is None else valid.reshape(-1).astype(jnp.float32)
    cm = jnp.zeros((num_classes * num_classes,), jnp.float32)
    if weights is None:
        cm = cm.at[idx].add(1.0, mode="drop")
    else:
        cm = cm.at[idx].add(weights, mode="drop")
    return cm.reshape(num_classes, num_classes)


def iou_from_confusion(cm):
    """cm [C, C] -> dict(oa, macc, miou, iou [C], class_acc [C]).

    Matches IoU_from_confusions (s3dis_closer_utils.py:320-352): classes
    absent from both prediction and GT get IoU 0 in the array but are
    excluded from the means via presence masking in iou_util_new.py style."""
    cm = jnp.asarray(cm, jnp.float32)
    tp = jnp.diagonal(cm)
    fn = cm.sum(axis=1) - tp
    fp = cm.sum(axis=0) - tp
    denom = tp + fp + fn
    iou = jnp.where(denom > 0, tp / jnp.maximum(denom, 1e-9), 0.0)
    present = cm.sum(axis=1) > 0
    class_acc = jnp.where(present, tp / jnp.maximum(cm.sum(axis=1), 1e-9), 0.0)
    oa = tp.sum() / jnp.maximum(cm.sum(), 1e-9)
    n_present = jnp.maximum(present.sum(), 1)
    return {
        "oa": oa,
        "macc": jnp.where(present, class_acc, 0.0).sum() / n_present,
        "miou": jnp.where(present, iou, 0.0).sum() / n_present,
        "iou": iou,
        "class_acc": class_acc,
    }


class ConfusionAccumulator:
    """Host-side streaming wrapper around the on-device confusion matrix."""

    def __init__(self, num_classes):
        self.num_classes = num_classes
        self.cm = np.zeros((num_classes, num_classes), np.float64)

    def update(self, pred, label, valid=None):
        self.cm += np.asarray(
            confusion_matrix(jnp.asarray(pred), jnp.asarray(label),
                             self.num_classes,
                             None if valid is None else jnp.asarray(valid)))

    def compute(self):
        return {k: np.asarray(v)
                for k, v in iou_from_confusion(jnp.asarray(self.cm)).items()}
