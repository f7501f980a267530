"""F-score for point-cloud reconstruction, on device.

Replaces the open3d-based host evaluation of the reference
(/root/reference/utils/f1_metric.py:9-90 and utils/grdnet_utils.py:70-129)
with the same protocol computed from the tiled Chamfer distances: precision is
the fraction of predicted points within ``threshold`` (euclidean) of the GT,
recall the converse, F = 2pr/(p+r).
"""

import jax.numpy as jnp

from cloud_transformers_tpu.losses.chamfer import chamfer_distance


def f_score_from_dists(dist_pred_sq, dist_gt_sq, threshold=0.01,
                       valid_pred=None, valid_gt=None):
    """F-score from squared NN distances (as returned by chamfer_distance)."""
    th_sq = threshold * threshold
    if valid_pred is None:
        precision = jnp.mean(dist_pred_sq < th_sq, axis=-1)
    else:
        w = valid_pred.astype(dist_pred_sq.dtype)
        precision = (jnp.sum((dist_pred_sq < th_sq) * w, -1)
                     / jnp.clip(jnp.sum(w, -1), 1))
    if valid_gt is None:
        recall = jnp.mean(dist_gt_sq < th_sq, axis=-1)
    else:
        w = valid_gt.astype(dist_gt_sq.dtype)
        recall = (jnp.sum((dist_gt_sq < th_sq) * w, -1)
                  / jnp.clip(jnp.sum(w, -1), 1))
    f = jnp.where(precision + recall > 0,
                  2.0 * precision * recall
                  / jnp.clip(precision + recall, 1e-12), 0.0)
    return f, precision, recall


def f_score(pred, gt, threshold=0.01, chunk_size=1024,
            valid_pred=None, valid_gt=None):
    """Per-batch (f, precision, recall) at ``threshold``; clouds [B, N, 3]."""
    d1, d2, _, _ = chamfer_distance(pred, gt, chunk_size,
                                    valid1=valid_pred, valid2=valid_gt)
    return f_score_from_dists(d1, d2, threshold, valid_pred, valid_gt)
