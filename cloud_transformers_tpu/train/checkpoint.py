"""Orbax checkpointing with the reference's {periodic, per-epoch, best}
policy.

Reference behavior: torch.save per object to ``{exp}/{name}_{epoch}_{n}.t7``
every ``save_each`` iters / ``save_each_epoch`` epochs plus metric-gated
``best`` / ``macc_best`` checkpoints (utils/train_util.py:74-79,
train_classification.py:262-284,362-374); restore with optional optimizer
state and LR override (train_util.py:82-118, restore.new_lr).
"""

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, exp_dir: str, max_to_keep: int = 5):
        self.exp_dir = os.path.abspath(exp_dir)
        os.makedirs(self.exp_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, tag) -> str:
        return os.path.join(self.exp_dir, f"ckpt_{tag}")

    def save(self, state, tag, force=True, meta: Optional[dict] = None):
        """Save a TrainState under a tag ('latest', 'best', an epoch number,
        or an iteration count).

        ``meta`` (global_step / epoch / rng ...) rides along so a killed run
        resumes seamlessly — the reference restores model + optimizer and
        resumes epochs (utils/train_util_distributed.py:91-103)."""
        path = self._path(tag)
        payload = {"state": jax.device_get(state)}
        if meta is not None:
            payload["meta"] = jax.device_get(meta)
        self._ckptr.save(path, payload, force=force)
        self._ckptr.wait_until_finished()
        return path

    def restore(self, state, tag="latest", path: Optional[str] = None,
                meta: Optional[dict] = None):
        """Restore into the (abstract) structure of ``state`` (+ optional
        ``meta`` skeleton). Returns state or (state, meta)."""
        path = path or self._path(tag)
        target = {"state": jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, state)}
        if meta is not None:
            target["meta"] = jax.tree_util.tree_map(
                ocp.utils.to_shape_dtype_struct, meta)
        restored = self._ckptr.restore(path, target)
        if meta is not None:
            return restored["state"], restored["meta"]
        return restored["state"]

    def exists(self, tag="latest") -> bool:
        return os.path.isdir(self._path(tag))


def restore_params_only(ckpt_path: str, state):
    """Restore model params/batch-stats but keep fresh optimizer state — the
    equivalent of the reference's model-only ``restore_exp``
    (utils/train_util.py:82-96).

    Layout-agnostic: reads the checkpoint WITHOUT a target tree and digs the
    params/batch_stats out of whatever was saved — a trainer checkpoint
    ({'state': TrainState, 'meta': ...}), a ``save_params_only`` tree, or a
    converter output — so eval/finetune works on any of them."""
    raw = ocp.StandardCheckpointer().restore(os.path.abspath(ckpt_path))
    tree = raw.get("state", raw) if isinstance(raw, dict) else raw
    if not isinstance(tree, dict) or "params" not in tree:
        raise ValueError(
            f"checkpoint at {ckpt_path} has no 'params' "
            f"(top-level keys: {list(raw) if isinstance(raw, dict) else raw})")
    return state.replace(params=tree["params"],
                         batch_stats=tree.get("batch_stats", {}))


def save_params_only(params, batch_stats, path: str):
    """Save a bare {params, batch_stats} tree (converter / export paths)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path),
               {"state": {"params": jax.device_get(params),
                          "batch_stats": jax.device_get(batch_stats)}},
               force=True)
    ckptr.wait_until_finished()
