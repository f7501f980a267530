"""Generic data-parallel trainer: pjit step, on-device metrics, checkpoints.

Replaces the reference's per-task DDP loops (train_*.py + utils/
train_util_distributed.py).  Key differences by design (SURVEY.md §3):

* one process drives all local devices; the batch is sharded over the mesh's
  'data' axis, so DDP gradient all-reduce, SyncBN statistics, and the
  reference's ``reduce_loss_dict``/pickle-``all_gather`` (D2H every step) all
  collapse into GSPMD-inserted collectives with metrics staying on device;
* checkpoints are Orbax with the same {periodic, per-epoch, best} policy;
* the LR schedule is folded into optax (StepLR per global step).

Task scripts provide a ``loss_fn(apply_fn, variables, batch, rng, train) ->
(loss, aux_metrics, new_batch_stats)`` and optionally an eval step.
"""

import os
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cloud_transformers_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from cloud_transformers_tpu.train.checkpoint import CheckpointManager
from cloud_transformers_tpu.train.config import experiment_dirs
from cloud_transformers_tpu.train.logging import MetricLogger, setup_logger
from cloud_transformers_tpu.train.optim import make_optimizer
from cloud_transformers_tpu.train.state import TrainState, create_train_state

LossFn = Callable[..., Any]


class Trainer:
    def __init__(self, model, cfg, exp_name, loss_fn: LossFn,
                 sample_args, eval_fn: Optional[LossFn] = None,
                 config_path=None, mesh=None, seed=0):
        self.model = model
        self.cfg = cfg
        self.loss_fn = loss_fn
        self.eval_fn = eval_fn or loss_fn
        self.logger = setup_logger()
        # Persistent executable cache: on for local PJRT runtimes, off on
        # the axon tunnel (measured net loss there — see
        # utils/compile_cache.py docstring for the A/B numbers).
        from cloud_transformers_tpu.utils.compile_cache import (
            enable_persistent_cache)
        enable_persistent_cache()
        self.mesh = mesh if mesh is not None else make_mesh(n_points=1)
        self.rng = jax.random.PRNGKey(seed)

        exp_dir, writer_dir = experiment_dirs(cfg, exp_name)
        self.exp_dir = exp_dir
        self.metrics = MetricLogger(writer_dir, exp_dir, config_path,
                                    is_main_process=jax.process_index() == 0)
        self.ckpt = CheckpointManager(exp_dir)

        tx = make_optimizer(cfg["train"])
        self.state = create_train_state(model, sample_args, tx,
                                        rng=self.rng, train=True)
        if "scale_lr" in cfg["train"]:
            # rebuild with param labels now that params exist
            tx = make_optimizer(cfg["train"], self.state.params)
            self.state = self.state.replace(
                tx=tx, opt_state=tx.init(self.state.params))
        self.state = replicate(self.mesh, self.state)
        self.global_step = 0
        self.epoch = 0

        self._train_step = jax.jit(self._train_step_impl,
                                   donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval_step_impl)

        # auto-resume: a killed run continues from ckpt_latest with its
        # optimizer state, step, epoch, and rng (the reference resumes
        # model+optimizer+epoch via restore_exp, train_util.py:82-118 +
        # train_util_distributed.py:91-103)
        resumed = False
        if (bool(cfg.get("train", {}).get("auto_resume", True))
                and self.ckpt.exists("latest")):
            last_err = None
            for attempt in (0, 1):
                try:
                    state, meta = self.ckpt.restore(
                        jax.device_get(self.state), tag="latest",
                        meta=self._meta())
                    self.state = replicate(self.mesh, state)
                    self.global_step = int(meta["global_step"])
                    self.epoch = int(meta["epoch"])
                    self.rng = meta["rng"]
                    resumed = True
                    self.logger.info(
                        "auto-resumed from %s (step %d, epoch %d)",
                        self.ckpt._path("latest"), self.global_step,
                        self.epoch)
                    break
                except Exception as e:
                    last_err = e
                    if attempt == 0:
                        # transient I/O errors (fs hiccup, interrupted read)
                        # deserve one retry before any destructive handling
                        self.logger.warning(
                            "auto-resume attempt failed (%s); retrying", e)
            if not resumed and last_err is not None:
                if isinstance(last_err, (ValueError, KeyError, TypeError)):
                    # structural mismatch (torn/foreign/layout-incompatible
                    # checkpoint): quarantine it so the evidence survives
                    # and later 'latest' saves don't bury it; restart fresh
                    quarantine = self.ckpt._path(
                        f"latest_unreadable_{int(time.time())}")
                    try:
                        os.rename(self.ckpt._path("latest"), quarantine)
                    except OSError:
                        quarantine = "<rename failed>"
                    self.logger.error(
                        "AUTO-RESUME FAILED: ckpt_latest could not be "
                        "restored (%s). It was moved to %s; training "
                        "restarts from scratch.", last_err, quarantine)
                else:
                    # persistent but non-structural (I/O, OOM): the ckpt is
                    # probably fine — fail fast so the operator can restart
                    # instead of silently discarding training progress
                    raise last_err

        # optional restore (cfg['restore'] section, train_util.py:82-118).
        # Runs only at run START: after a successful auto-resume the model
        # already carries trained weights, and re-applying the pretrained
        # restore would silently discard all progress since the last start
        # (the reference likewise restores only before its epoch loop,
        # train_classification.py:132-141)
        restore = cfg.get("restore")
        if resumed and restore and restore.get("generator"):
            self.logger.info(
                "skipping cfg['restore'] (%s): run auto-resumed from "
                "ckpt_latest", restore["generator"])
            restore = None
        if restore and restore.get("generator"):
            from cloud_transformers_tpu.train.checkpoint import (
                restore_params_only)
            self.state = restore_params_only(restore["generator"], self.state)
            self.logger.info("restored params from %s", restore["generator"])
            if restore.get("new_lr") is not None:
                # LR override on resume (train_classification.py:139-141)
                new_cfg = dict(cfg["train"],
                               optimizer=dict(cfg["train"]["optimizer"],
                                              lr=float(restore["new_lr"])))
                tx = make_optimizer(new_cfg, self.state.params)
                self.state = self.state.replace(
                    tx=tx, opt_state=tx.init(self.state.params))
                self.state = replicate(self.mesh, self.state)

    def _meta(self):
        return {"global_step": self.global_step, "epoch": self.epoch,
                "rng": jax.device_get(self.rng)}

    # --- steps -----------------------------------------------------------
    def _train_step_impl(self, state, batch, rng):
        def compute(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            loss, aux, new_stats = self.loss_fn(
                state.apply_fn, variables, batch, rng, True)
            return loss, (aux, new_stats)

        (loss, (aux, new_stats)), grads = jax.value_and_grad(
            compute, has_aux=True)(state.params)
        metrics = {"loss": loss, **aux}
        if self.cfg.get("train", {}).get("grad_stats"):
            # on-device per-parameter gradient norms (the reference's
            # grad_stats histograms/norms, train_classification.py:208-225)
            import optax
            metrics["grad_norm"] = optax.global_norm(grads)
            flat = jax.tree_util.tree_leaves_with_path(grads)
            for path, leaf in flat:
                name = jax.tree_util.keystr(path).replace("'", "").strip(
                    "[]").replace("][", ".")
                metrics[f"grad_norm/{name}"] = jnp.sqrt(
                    jnp.sum(leaf.astype(jnp.float32) ** 2))
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=new_stats)
        return state, metrics

    def _eval_step_impl(self, state, batch, rng):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        loss, aux, _ = self.eval_fn(state.apply_fn, variables, batch, rng,
                                    False)
        return {"loss": loss, **aux}

    def train_step(self, batch):
        self.rng, step_rng = jax.random.split(self.rng)
        batch = shard_batch(self.mesh, batch)
        self.state, metrics = self._train_step(self.state, batch, step_rng)
        self.global_step += 1
        return metrics

    def eval_step(self, batch):
        self.rng, step_rng = jax.random.split(self.rng)
        batch = shard_batch(self.mesh, batch)
        return self._eval_step(self.state, batch, step_rng)

    # --- loop ------------------------------------------------------------
    def fit(self, train_loader, val_loader=None,
            eval_hook: Optional[Callable] = None,
            num_epochs: Optional[int] = None, max_steps: Optional[int] = None,
            epoch_hook: Optional[Callable] = None,
            mesh_hook: Optional[Callable] = None):
        """Run the reference's epoch loop: periodic logging/ckpt, validation
        every ``val_step`` epochs, best-metric checkpoints (``best`` for the
        primary metric, ``macc_best`` for m_acc — the reference's two gates,
        train_classification.py:362-374)."""
        tcfg = self.cfg["train"]
        num_epochs = num_epochs or int(tcfg.get("num_epochs", 1))
        show_each = int(tcfg.get("show_each", 100))
        save_each = int(tcfg.get("save_each", 0))
        save_each_epoch = int(tcfg.get("save_each_epoch", 1))
        val_step = int(tcfg.get("val_step", 1))
        save = bool(tcfg.get("save", True))
        # profile_step: start a jax.profiler trace at that global step for
        # profile_steps steps; trace lands in {exp}/profile (SURVEY §5)
        profile_at = tcfg.get("profile_step")
        profile_len = int(tcfg.get("profile_steps", 5))
        profiling = False
        # point-cloud summaries every mesh_each steps (the reference logs
        # recon/gt meshes every 30 batches, train_inpainter.py:236-243)
        mesh_each = int(tcfg.get("mesh_each", 100))
        keys = [tcfg.get("best_metric", "loss")]
        keys += [k for k in tcfg.get("best_metrics", []) if k not in keys]
        best = {k: -np.inf for k in keys}

        for epoch in range(self.epoch, num_epochs):
            self.epoch = epoch
            train_loader.set_epoch(epoch)
            t0 = time.time()
            window = []
            data_t = step_t = 0.0
            t_fetch = time.time()
            for batch in train_loader:
                data_t += time.time() - t_fetch
                if profile_at is not None and self.global_step == profile_at:
                    jax.profiler.start_trace(
                        f"{self.exp_dir}/profile")
                    profiling = True
                t_step = time.time()
                metrics = self.train_step(batch)
                window.append(metrics)
                step_t += time.time() - t_step
                if (profiling
                        and self.global_step >= profile_at + profile_len):
                    jax.tree_util.tree_map(
                        lambda x: x.block_until_ready(), metrics)
                    jax.profiler.stop_trace()
                    profiling = False
                    self.logger.info("profiler trace written to %s/profile",
                                     self.exp_dir)
                if self.global_step % show_each == 0:
                    host = {k: float(np.mean([float(m[k]) for m in window]))
                            for k in window[0] if np.ndim(window[0][k]) == 0}
                    window = []
                    host["steps_per_sec"] = show_each / (time.time() - t0)
                    # data/batch time split (reference logs these per step,
                    # train_segmentation.py:173-210)
                    host["data_time"] = data_t / show_each
                    host["batch_time"] = step_t / show_each
                    data_t = step_t = 0.0
                    t0 = time.time()
                    self.metrics.scalars(self.global_step, host,
                                         prefix="train/")
                    self.logger.info(
                        "epoch %d step %d: %s", epoch, self.global_step,
                        {k: round(v, 4) for k, v in host.items()
                         if "/" not in k})
                if (mesh_hook is not None and mesh_each
                        and self.global_step % mesh_each == 0):
                    mesh_hook(self, batch)
                if save and save_each and self.global_step % save_each == 0:
                    self.ckpt.save(self.state, "latest", meta=self._meta())
                if max_steps and self.global_step >= max_steps:
                    if profiling:
                        jax.profiler.stop_trace()
                        profiling = False
                    if save:
                        self.ckpt.save(self.state, "latest",
                                       meta=self._meta())
                    return self.state
                t_fetch = time.time()

            if save and (epoch + 1) % save_each_epoch == 0:
                self.ckpt.save(self.state, "latest", meta=self._meta())

            if val_loader is not None and (epoch + 1) % val_step == 0:
                val_metrics = self.validate(val_loader, eval_hook)
                self.metrics.scalars(self.global_step, val_metrics,
                                     prefix="val/")
                self.logger.info("epoch %d val: %s", epoch,
                                 {k: round(float(v), 4)
                                  for k, v in val_metrics.items()
                                  if np.ndim(v) == 0})
                for key in keys:
                    score = -val_metrics.get(key, np.inf) \
                        if key == "loss" else val_metrics.get(key, -np.inf)
                    if save and score > best[key]:
                        best[key] = score
                        tag = ("best" if key == keys[0]
                               else f"{key.replace('m_acc', 'macc')}_best")
                        self.ckpt.save(self.state, tag, meta=self._meta())
            if epoch_hook is not None and (epoch + 1) % val_step == 0:
                hook_metrics = epoch_hook(epoch) or {}
                if hook_metrics:
                    self.metrics.scalars(self.global_step, hook_metrics,
                                         prefix="val/")
        if profiling:
            jax.profiler.stop_trace()
        return self.state

    def validate(self, val_loader, eval_hook=None):
        """Average eval metrics over the loader; ``eval_hook(batch, metrics)``
        can accumulate task-specific statistics (confusion matrices, ...).
        If the hook has ``compute()``, its results are merged into (and
        override) the returned metrics — so m_acc / mIoU drive the best-
        checkpoint gates."""
        if eval_hook is not None and hasattr(eval_hook, "reset"):
            eval_hook.reset()
        sums: Dict[str, float] = {}
        count = 0
        for batch in val_loader:
            m = self.eval_step(batch)
            if eval_hook is not None:
                eval_hook(batch, m)
            for k, v in m.items():
                if np.ndim(v) == 0:
                    sums[k] = sums.get(k, 0.0) + float(v)
            count += 1
        out = {k: v / max(count, 1) for k, v in sums.items()}
        if eval_hook is not None and hasattr(eval_hook, "compute"):
            out.update(eval_hook.compute())
        return out
