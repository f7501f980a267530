"""End-to-end training smoke tests on the virtual CPU mesh: loss decreases,
checkpoints round-trip, data-parallel across 8 devices (SURVEY.md §4 items
4-5)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cloud_transformers_tpu.data import DataLoader, ScanObjectNN
from cloud_transformers_tpu.parallel.mesh import make_mesh
from cloud_transformers_tpu.tasks import classification
from cloud_transformers_tpu.train.optim import make_optimizer
from cloud_transformers_tpu.train.trainer import Trainer


def tiny_cfg(tmp_path, lr=1e-3):
    return {
        "experiment": {"root": str(tmp_path / "exp"),
                       "writer_root": str(tmp_path / "runs")},
        "data": {"batch_size": 8, "num_points": 64},
        "model": {"name": "tiny"},
        "train": {
            "seg_weight": 0.5,
            "show_each": 1000,
            "save_each": 0,
            "save_each_epoch": 100,
            "val_step": 100,
            "num_epochs": 1,
            "optimizer": {"type": "Adam", "lr": lr},
            "scheduler": {"type": "StepLR", "gamma": 0.7, "step_size": 1000},
        },
    }


class TinyClassifier:
    """Small stand-in with the classifier's interface for fast CPU tests."""

    def __new__(cls, n_classes=15):
        import flax.linen as nn

        class M(nn.Module):
            @nn.compact
            def __call__(self, pcd, train=True):
                from cloud_transformers_tpu.nn import MultiHeadUnion
                x = nn.Dense(32)(pcd)
                x = nn.relu(nn.BatchNorm(use_running_average=not train)(x))
                x, stats = MultiHeadUnion(
                    model_dim=32, features_dims=[4], heads=[2],
                    tensor_sizes=[8], tensor_dims=[3])(x, pcd, train=train)
                pooled = jnp.mean(x, axis=1)
                cls = nn.Dense(n_classes)(pooled)
                mask = nn.Dense(1)(x)
                return cls, mask, stats

        return M()


class TestTrainLoop:
    def test_loss_decreases_on_synthetic(self, tmp_path):
        ds = ScanObjectNN(None, train=False, num_points=64,
                          synthetic_items=64)
        loader = DataLoader(ds, 8, shuffle=True)
        cfg = tiny_cfg(tmp_path)
        model = TinyClassifier()
        loss_fn = classification.make_loss_fn(0.5)
        sample = next(iter(loader))
        trainer = Trainer(model, cfg, "t", loss_fn,
                          sample_args=(jnp.asarray(sample["pcd"]),))
        losses = []
        for epoch in range(6):
            loader.set_epoch(epoch)
            for batch in loader:
                m = trainer.train_step(batch)
                losses.append(float(m["loss"]))
        assert np.mean(losses[-8:]) < np.mean(losses[:8]) * 0.9, losses

    def test_checkpoint_roundtrip(self, tmp_path):
        ds = ScanObjectNN(None, train=False, num_points=64,
                          synthetic_items=16)
        loader = DataLoader(ds, 8)
        cfg = tiny_cfg(tmp_path)
        model = TinyClassifier()
        loss_fn = classification.make_loss_fn(0.5)
        sample = next(iter(loader))
        trainer = Trainer(model, cfg, "t", loss_fn,
                          sample_args=(jnp.asarray(sample["pcd"]),))
        for batch in loader:
            trainer.train_step(batch)
        path = trainer.ckpt.save(trainer.state, "latest")
        assert os.path.isdir(path)
        restored = trainer.ckpt.restore(trainer.state, "latest")
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                    np.asarray(b)),
            jax.device_get(trainer.state.params), restored.params)

    def test_data_parallel_8_devices(self, tmp_path):
        assert jax.device_count() == 8
        mesh = make_mesh()
        assert mesh.shape["data"] == 8
        ds = ScanObjectNN(None, train=False, num_points=64,
                          synthetic_items=32)
        loader = DataLoader(ds, 16)
        cfg = tiny_cfg(tmp_path)
        model = TinyClassifier()
        loss_fn = classification.make_loss_fn(0.5)
        sample = next(iter(loader))
        trainer = Trainer(model, cfg, "t", loss_fn,
                          sample_args=(jnp.asarray(sample["pcd"]),),
                          mesh=mesh)
        for batch in loader:
            m = trainer.train_step(batch)
        assert np.isfinite(float(m["loss"]))
        # params stay replicated, grads were synced by GSPMD
        leaf = jax.tree_util.tree_leaves(trainer.state.params)[0]
        assert leaf.sharding.is_fully_replicated

    def test_optimizer_factory_schedule(self):
        tx = make_optimizer({"optimizer": {"type": "Adam", "lr": 1.0},
                             "scheduler": {"type": "StepLR", "gamma": 0.5,
                                           "step_size": 2}})
        params = {"w": jnp.ones(3)}
        state = tx.init(params)
        g = {"w": jnp.ones(3)}
        # lr halves every 2 steps (staircase)
        deltas = []
        p = params
        for i in range(4):
            upd, state = tx.update(g, state, p)
            deltas.append(float(jnp.abs(upd["w"][0])))
        assert deltas[0] > deltas[3]


class TestAutoResume:
    def test_killed_run_resumes_step_epoch_rng(self, tmp_path):
        """A new Trainer on the same exp dir continues from ckpt_latest with
        step/epoch/rng and optimizer state (ref restore_exp semantics)."""
        ds = ScanObjectNN(None, train=False, num_points=64,
                          synthetic_items=16)
        loader = DataLoader(ds, 8)
        cfg = tiny_cfg(tmp_path)
        model = TinyClassifier()
        loss_fn = classification.make_loss_fn(0.5)
        sample = next(iter(loader))
        t1 = Trainer(model, cfg, "resume_t", loss_fn,
                     sample_args=(jnp.asarray(sample["pcd"]),))
        for batch in loader:
            t1.train_step(batch)
        t1.epoch = 3
        t1.ckpt.save(t1.state, "latest", meta=t1._meta())
        step, rng = t1.global_step, np.asarray(t1.rng)

        t2 = Trainer(TinyClassifier(), cfg, "resume_t", loss_fn,
                     sample_args=(jnp.asarray(sample["pcd"]),))
        assert t2.global_step == step
        assert t2.epoch == 3
        np.testing.assert_array_equal(np.asarray(t2.rng), rng)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b)),
            jax.device_get(t1.state.params), jax.device_get(t2.state.params))
        # optimizer state (adam moments) resumed too
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b)),
            jax.device_get(t1.state.opt_state),
            jax.device_get(t2.state.opt_state))

    def test_resume_skips_cfg_restore(self, tmp_path):
        """After a successful auto-resume, the cfg['restore'] (finetune
        from pretrained) block must NOT overwrite the resumed params —
        otherwise every restart of a finetune run silently loses all
        progress since the last start while keeping the resumed step."""
        from cloud_transformers_tpu.train.checkpoint import save_params_only
        ds = ScanObjectNN(None, train=False, num_points=64,
                          synthetic_items=16)
        loader = DataLoader(ds, 8)
        cfg = tiny_cfg(tmp_path)
        model = TinyClassifier()
        loss_fn = classification.make_loss_fn(0.5)
        sample = next(iter(loader))

        # "pretrained" checkpoint = the fresh init of a throwaway run
        pre = Trainer(model, cfg, "pre", loss_fn,
                      sample_args=(jnp.asarray(sample["pcd"]),))
        pre_path = str(tmp_path / "pretrained")
        save_params_only(jax.device_get(pre.state.params),
                         jax.device_get(pre.state.batch_stats), pre_path)

        cfg_ft = dict(tiny_cfg(tmp_path),
                      restore={"generator": pre_path})
        t1 = Trainer(TinyClassifier(), cfg_ft, "ft", loss_fn,
                     sample_args=(jnp.asarray(sample["pcd"]),))
        for batch in loader:
            t1.train_step(batch)
        t1.ckpt.save(t1.state, "latest", meta=t1._meta())

        # restart: auto-resume must win over the restore section
        t2 = Trainer(TinyClassifier(), cfg_ft, "ft", loss_fn,
                     sample_args=(jnp.asarray(sample["pcd"]),))
        assert t2.global_step == t1.global_step
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b)),
            jax.device_get(t1.state.params), jax.device_get(t2.state.params))


class TestRestoreParamsOnly:
    def test_restores_from_all_checkpoint_layouts(self, tmp_path):
        """restore_params_only must read trainer checkpoints (state+meta),
        save_params_only output, and be loud on garbage."""
        from cloud_transformers_tpu.train.checkpoint import (
            restore_params_only, save_params_only)
        ds = ScanObjectNN(None, train=False, num_points=64,
                          synthetic_items=16)
        loader = DataLoader(ds, 8)
        cfg = tiny_cfg(tmp_path)
        model = TinyClassifier()
        loss_fn = classification.make_loss_fn(0.5)
        sample = next(iter(loader))
        tr = Trainer(model, cfg, "rpo", loss_fn,
                     sample_args=(jnp.asarray(sample["pcd"]),))
        tr.train_step(next(iter(loader)))

        # layout 1: trainer save with meta
        p1 = tr.ckpt.save(tr.state, "best", meta=tr._meta())
        fresh = Trainer(TinyClassifier(), tiny_cfg(tmp_path), "rpo2",
                        loss_fn,
                        sample_args=(jnp.asarray(sample["pcd"]),))
        got = restore_params_only(p1, jax.device_get(fresh.state))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                    np.asarray(b)),
            jax.device_get(tr.state.params), got.params)

        # layout 2: bare params/batch_stats (converter output path)
        p2 = str(tmp_path / "bare_ckpt")
        save_params_only(jax.device_get(tr.state.params),
                         jax.device_get(tr.state.batch_stats), p2)
        got2 = restore_params_only(p2, jax.device_get(fresh.state))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                    np.asarray(b)),
            jax.device_get(tr.state.params), got2.params)
