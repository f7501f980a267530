"""Point-cloud (add_mesh) summaries: the trainer's mesh_hook cadence and the
completion/reconstruction hooks writing through MetricLogger (VERDICT:
reference logs recon meshes during training, train_inpainter.py:236-243)."""

import glob
import os
import types

import jax
import jax.numpy as jnp
import numpy as np

from cloud_transformers_tpu.data import DataLoader, ScanObjectNN
from cloud_transformers_tpu.tasks import classification, completion
from cloud_transformers_tpu.train.logging import MetricLogger
from cloud_transformers_tpu.train.trainer import Trainer
from tests.test_train import TinyClassifier, tiny_cfg


def test_metric_logger_mesh_writes_event(tmp_path):
    ml = MetricLogger(str(tmp_path / "runs"))
    assert ml.writer is not None, "tensorboardX expected in this image"
    ml.mesh(1, "recon", np.random.rand(2, 64, 3).astype(np.float32))
    ml.close()
    events = glob.glob(str(tmp_path / "runs" / "events.*"))
    assert events and os.path.getsize(events[0]) > 0


def test_fit_calls_mesh_hook_on_cadence(tmp_path):
    ds = ScanObjectNN(None, train=False, num_points=64, synthetic_items=32)
    loader = DataLoader(ds, 8)
    cfg = tiny_cfg(tmp_path)
    cfg["train"]["mesh_each"] = 2
    model = TinyClassifier()
    loss_fn = classification.make_loss_fn(0.5)
    sample = next(iter(loader))
    trainer = Trainer(model, cfg, "mesh_t", loss_fn,
                      sample_args=(jnp.asarray(sample["pcd"]),))
    calls = []
    trainer.fit(loader, mesh_hook=lambda tr, batch: calls.append(
        tr.global_step), num_epochs=1)
    # 4 steps/epoch, cadence 2 -> hooks at steps 2 and 4
    assert calls == [2, 4], calls


def test_completion_mesh_hook_logs_three_clouds(tmp_path):
    """The completion hook must log recon/gt/partial point clouds through
    trainer.metrics.mesh using the real partial_postprocess path."""
    logged = []

    class SpyMetrics:
        def mesh(self, step, tag, pts, colors=None):
            logged.append((tag, np.asarray(pts).shape))

    def apply_fn(variables, noise, parts, train=False):
        # tiny stand-in decoder: recon = noise xyz
        return noise[..., :3], [{"occupancy": jnp.float32(0.5)}]

    trainer = types.SimpleNamespace(
        global_step=7,
        metrics=SpyMetrics(),
        state=types.SimpleNamespace(apply_fn=apply_fn, params={},
                                    batch_stats={}),
    )
    batch = {"gt": np.random.rand(3, 128, 3).astype(np.float32),
             "partial": np.random.rand(3, 64, 3).astype(np.float32)}
    completion.make_mesh_hook(max_clouds=2)(trainer, batch)
    tags = [t for t, _ in logged]
    assert tags == ["train/recon", "train/gt", "train/partial_input"]
    shapes = dict(logged)
    assert shapes["train/recon"] == (2, 128, 3), logged
    assert shapes["train/gt"] == (2, 128, 3), logged
    # the partial input keeps its own (smaller) point count
    assert shapes["train/partial_input"][0] == 2
    assert shapes["train/partial_input"][2] == 3
