"""Experiment logging: TensorBoard (when available) + JSONL + console.

Reference behavior: tensorboardX SummaryWriter per experiment with config and
model-source snapshotting for provenance (utils/train_util.py:53-71), rank-0
only writing, per-block lattice occupancy/key-stats scalars
(train_classification.py:253-260).
"""

import json
import logging
import os
import shutil
import sys
import time


def setup_logger(name="cloud_transformers_tpu"):
    """Console logger in the style of the reference's s3dis_closer_logger."""
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stdout)
        h.setFormatter(logging.Formatter(
            "[%(asctime)s %(name)s]: %(message)s", datefmt="%m/%d %H:%M:%S"))
        logger.addHandler(h)
        logger.setLevel(logging.INFO)
        logger.propagate = False  # the root logger double-prints otherwise
    return logger


class MetricLogger:
    """Writes scalars to TensorBoard (if tensorboardX importable) and to a
    JSONL file; snapshots the config into the experiment dir."""

    def __init__(self, writer_dir, exp_dir=None, config_path=None,
                 is_main_process=True):
        self.is_main = is_main_process
        self.writer = None
        self.jsonl = None
        if not self.is_main:
            return
        os.makedirs(writer_dir, exist_ok=True)
        try:
            from tensorboardX import SummaryWriter
            self.writer = SummaryWriter(writer_dir)
        except Exception:
            self.writer = None
        self.jsonl = open(os.path.join(writer_dir, "metrics.jsonl"), "a")
        if config_path and exp_dir:
            os.makedirs(exp_dir, exist_ok=True)
            shutil.copy(config_path,
                        os.path.join(exp_dir, os.path.basename(config_path)))

    def scalars(self, step, metrics, prefix=""):
        if not self.is_main:
            return
        clean = {}
        for k, v in metrics.items():
            try:
                clean[prefix + k] = float(v)
            except (TypeError, ValueError):
                continue
        if self.writer is not None:
            for k, v in clean.items():
                self.writer.add_scalar(k, v, global_step=step)
        if self.jsonl is not None:
            self.jsonl.write(json.dumps(
                {"step": int(step), "time": time.time(), **clean}) + "\n")
            self.jsonl.flush()

    def block_stats(self, step, stats_list, prefix="train/"):
        """Per-block occupancy / key statistics
        (train_classification.py:253-260)."""
        if not self.is_main:
            return
        for i, s in enumerate(stats_list):
            self.scalars(step, {
                f"occupancy/block_{i}": s["occupancy"],
                f"key_mean/block_{i}": s["key_mean"],
                f"key_var/block_{i}": s["key_var"],
            }, prefix=prefix)

    def mesh(self, step, tag, points, colors=None):
        """Log a point cloud (train_inpainter.py:236-243 writer.add_mesh).

        points: [B, N, 3] array-like."""
        if not self.is_main or self.writer is None:
            return
        import numpy as np
        try:
            self.writer.add_mesh(tag, vertices=np.asarray(points),
                                 colors=colors, global_step=step)
        except Exception:
            pass  # mesh plugin is optional

    def close(self):
        if self.writer is not None:
            self.writer.close()
        if self.jsonl is not None:
            self.jsonl.close()


class AverageMeter:
    """Running average (reference: utils/grdnet_utils.py:26-60)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self):
        return self.sum / max(self.count, 1)
