"""S3DIS KPConv/CloserLook3D protocol: masked loss, vote-based validation,
metrics at part / sub-cloud / full-cloud granularity.

References: /root/reference/datasets/s3dis_closer_train.py (MaskedCrossEntropy
:11-18, grad clip 10 :51, multi-vote validation :70-178) and
datasets/s3dis_closer_utils.py:252-352 (IoU_from_confusions with
absent-class mIoU substitution, val-proportion rebalancing).
"""

from typing import List

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cloud_transformers_tpu.data.s3dis_kpconv import (
    S3DISSeg,
    get_scene_seg_features,
)


def make_loss_fn():
    """Masked cross-entropy: mean over valid (non-padding) points."""

    def loss_fn(apply_fn, variables, batch, rng, train):
        out, updates = apply_fn(
            variables, batch["points"], batch["mask"], batch["features"],
            train=train, rngs={"dropout": rng}, mutable=["batch_stats"])
        logits, stats = out
        per_pt = optax.softmax_cross_entropy_with_integer_labels(
            logits, batch["label"])
        mask = batch["mask"]
        loss = jnp.sum(per_pt * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        pred = jnp.argmax(logits, axis=-1)
        correct = jnp.sum((pred == batch["label"]) * mask)
        aux = {
            "acc": correct / jnp.maximum(jnp.sum(mask), 1.0),
            "logits": logits,
            "pred": pred,
        }
        return loss, aux, updates.get("batch_stats",
                                      variables.get("batch_stats", {}))
    return loss_fn


# --- metrics (numpy host side, matching the reference exactly) -----------

def confusion_np(truth, pred, num_classes):
    idx = truth.astype(np.int64) * num_classes + pred.astype(np.int64)
    return np.bincount(idx, minlength=num_classes ** 2).reshape(
        num_classes, num_classes)


def iou_from_confusions(c):
    """s3dis_closer_utils.py:252-278 — absent classes get the mIoU value
    substituted so the plain mean matches the present-class mean."""
    tp = np.diagonal(c, axis1=-2, axis2=-1).astype(np.float64)
    tp_fn = np.sum(c, axis=-1)
    tp_fp = np.sum(c, axis=-2)
    iou = tp / (tp_fp + tp_fn - tp + 1e-6)
    mask = tp_fn < 1e-3
    counts = np.sum(1 - mask, axis=-1, keepdims=True)
    miou = np.sum(iou, axis=-1, keepdims=True) / (counts + 1e-6)
    iou += mask * miou
    return iou


def part_metrics(num_classes, predictions, targets, val_proportions):
    c = np.zeros((num_classes, num_classes), np.float64)
    for logits, truth in zip(predictions, targets):
        c += confusion_np(truth, np.argmax(logits, axis=-1), num_classes)
    c *= np.expand_dims(val_proportions / (np.sum(c, axis=1) + 1e-6), 1)
    ious = iou_from_confusions(c)
    return ious, float(np.mean(ious))


def sub_metrics(num_classes, vote_logits, sub_labels, val_proportions):
    c = np.zeros((num_classes, num_classes), np.float64)
    for logits, truth in zip(vote_logits, sub_labels):
        c += confusion_np(truth, np.argmax(logits, axis=0), num_classes)
    c *= np.expand_dims(val_proportions / (np.sum(c, axis=1) + 1e-6), 1)
    ious = iou_from_confusions(c)
    return ious, float(np.mean(ious))


def full_metrics(num_classes, vote_logits, projections, full_labels):
    c = np.zeros((num_classes, num_classes), np.float64)
    for logits, proj, truth in zip(vote_logits, projections, full_labels):
        preds = np.argmax(logits[:, proj], axis=0)
        c += confusion_np(truth.reshape(-1), preds, num_classes)
    ious = iou_from_confusions(c)
    return ious, float(np.mean(ious))


def batch_rotate_scale_jitter(points, rng, x_range=0.0, y_range=0.0,
                              z_range=np.pi, scale_low=0.7, scale_high=1.3,
                              std=0.001, clip=0.05,
                              augment_symmetries=(True, False, False)):
    """Vote-round test-time augmentation (BatchPointcloudRandomRotate +
    BatchPointcloudScaleAndJitter, s3dis_closer_train.py:96-100)."""
    out = np.empty_like(points)
    for b in range(points.shape[0]):
        ax, ay, az = (rng.uniform(-x_range, x_range),
                      rng.uniform(-y_range, y_range),
                      rng.uniform(-z_range, z_range))
        cx, sx = np.cos(ax), np.sin(ax)
        cy, sy = np.cos(ay), np.sin(ay)
        cz, sz = np.cos(az), np.sin(az)
        rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        r = (rz @ ry @ rx).astype(np.float32)
        scale = rng.uniform(scale_low, scale_high, 3).astype(np.float32)
        for i, flag in enumerate(augment_symmetries):
            if flag and rng.rand() < 0.5:
                scale[i] = -scale[i]
        noise = np.clip(rng.randn(points.shape[1], 3) * std, -clip,
                        clip).astype(np.float32)
        out[b] = points[b] @ r.T * scale + noise
    return out


def validate_votes(eval_step, dataset: S3DISSeg, loader, num_classes,
                   num_votes=10, input_features_dim=4, test_smooth=0.95,
                   epoch=0, logger=None, seed=0):
    """Vote-accumulating validation (s3dis_closer_train.py:70-178).

    ``eval_step(batch) -> metrics`` with 'logits' [B, N, C].  Returns the
    final full-cloud (mIoU, per-class IoUs) plus sub-cloud/part values.
    """
    rng = np.random.RandomState(seed)
    vote_sum = [np.zeros((num_classes, l.shape[0]), np.float32)
                for l in dataset.sub_labels]
    vote_cnt = [np.zeros((1, l.shape[0]), np.float32) + 1e-6
                for l in dataset.sub_labels]
    # EMA-smoothed logits, reported as the reference's 'running sub_mIoU'
    # (s3dis_closer_train.py:142-143,161-164)
    running = [np.zeros((num_classes, l.shape[0]), np.float32)
               for l in dataset.sub_labels]
    val_proportions = np.array(
        [np.sum([np.sum(lbl == c) for lbl in dataset.clouds_labels])
         for c in range(num_classes)], np.float32)

    results = {}
    for v in range(num_votes):
        dataset.set_epoch((epoch + v) % max(dataset.num_epochs, 1))
        predictions: List[np.ndarray] = []
        targets: List[np.ndarray] = []
        for batch in loader:
            if v > 0:
                pts = batch_rotate_scale_jitter(batch["points"], rng)
                batch = dict(batch, points=pts)
                if input_features_dim > 5:
                    colors = batch["features"][..., :input_features_dim - 3]
                    batch["features"] = np.concatenate([colors, pts], -1)
            m = eval_step(batch)
            logits = np.asarray(m["logits"])  # [B, N, C]
            for ib in range(logits.shape[0]):
                mask_i = np.asarray(batch["mask"][ib]).astype(bool)
                lg = logits[ib][mask_i].T  # [C, n]
                inds = np.asarray(batch["input_inds"][ib])[mask_i]
                ci = int(batch["cloud_index"][ib])
                vote_sum[ci][:, inds] += lg
                vote_cnt[ci][:, inds] += 1
                running[ci][:, inds] = (test_smooth * running[ci][:, inds]
                                        + (1 - test_smooth) * lg)
                predictions.append(lg.T)
                targets.append(dataset.sub_labels[ci][inds])
        vote_logits = [s / c for s, c in zip(vote_sum, vote_cnt)]
        _, pmiou = part_metrics(num_classes, predictions, targets,
                                val_proportions)
        _, submiou = sub_metrics(num_classes, vote_logits,
                                 dataset.sub_labels, val_proportions)
        _, run_submiou = sub_metrics(num_classes, running,
                                     dataset.sub_labels, val_proportions)
        ious, miou = full_metrics(num_classes, vote_logits,
                                  dataset.projections, dataset.clouds_labels)
        results = {"part_miou": pmiou, "sub_miou": submiou,
                   "running_sub_miou": run_submiou, "miou": miou,
                   "ious": ious}
        if logger:
            logger.info("vote %d: part %.4f sub %.4f full %.4f",
                        v, pmiou, submiou, miou)
    return results
