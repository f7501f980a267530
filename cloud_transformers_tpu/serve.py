"""Batched inference engine for production serving.

The reference has no serving layer (SURVEY.md §1: "no serving layer"); this
is a deliberate extension for large-scale deployment: a compiled,
fixed-shape inference path with request batching/padding, checkpoint
loading, and optional data-parallel sharding over local chips.

Design notes (TPU):
* one compiled executable per (batch, points) bucket — requests are padded
  up to the nearest bucket so arbitrary request sizes never retrace;
* variable-size clouds are padded with repeated points (permutation-
  invariant models make duplicates harmless for classification; for
  per-point outputs the padding rows are sliced away);
* multi-chip: the batch axis is sharded over a 'data' mesh, GSPMD splits
  the work.

Example:
    engine = InferenceEngine.from_checkpoint(
        "scanobject_classifier", ckpt_dir, n_classes=15)
    probs = engine.classify([cloud1, cloud2])   # arbitrary-length clouds
"""

from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cloud_transformers_tpu.models import get_model
from cloud_transformers_tpu.parallel.mesh import make_mesh, replicate, shard_batch


def _next_bucket(n, buckets):
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class InferenceEngine:
    """Compiled, bucketed, batched inference over a point-cloud model."""

    def __init__(self, model, variables, batch_buckets=(1, 4, 8, 16),
                 point_buckets=(1024, 2048, 4096), mesh=None):
        self.model = model
        self.batch_buckets = tuple(sorted(batch_buckets))
        self.point_buckets = tuple(sorted(point_buckets))
        self.mesh = mesh if mesh is not None else make_mesh(n_points=1)
        self.variables = replicate(self.mesh, variables)
        self._compiled = {}

    @classmethod
    def from_checkpoint(cls, model_name, ckpt_dir=None, sample_points=2048,
                        rng=None, **model_kwargs):
        """Build the engine; restores an Orbax checkpoint when given
        (otherwise serves fresh initialization — useful for benchmarks)."""
        model = get_model(model_name, **model_kwargs)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        pcd = jnp.zeros((1, sample_points, 3))
        variables = jax.jit(lambda: model.init(
            {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
            pcd, train=False))()
        if ckpt_dir:
            import orbax.checkpoint as ocp
            restored = ocp.StandardCheckpointer().restore(
                ckpt_dir, jax.tree_util.tree_map(
                    ocp.utils.to_shape_dtype_struct, jax.device_get(
                        variables)))
            variables = restored
        return cls(model, variables)

    def _get_fn(self, b, p):
        key = (b, p)
        if key not in self._compiled:
            @jax.jit
            def fn(variables, pcd):
                return self.model.apply(variables, pcd, train=False)
            self._compiled[key] = fn
        return self._compiled[key]

    def predict_padded(self, clouds: Sequence[np.ndarray]):
        """clouds: list of [n_i, 3] arrays -> raw model outputs at padded
        shapes plus the real request count.  Point padding repeats each
        cloud's own points; batch padding repeats the last cloud.  The batch
        bucket is always rounded up to a multiple of the mesh 'data' size so
        the work genuinely shards (no silent fully-replicated compute)."""
        n = len(clouds)
        d = int(self.mesh.shape["data"])
        b = _next_bucket(n, self.batch_buckets)
        b = -(-b // d) * d  # mesh-divisible: every chip gets a real shard
        p = _next_bucket(max(c.shape[0] for c in clouds),
                         self.point_buckets)
        batch = np.zeros((b, p, 3), np.float32)
        for i in range(b):
            c = np.asarray(clouds[min(i, n - 1)], np.float32)
            reps = -(-p // c.shape[0])
            batch[i] = np.tile(c, (reps, 1))[:p]
        arr = shard_batch(self.mesh, {"pcd": batch})["pcd"]
        out = self._get_fn(b, p)(self.variables, arr)
        return out, n, b, p

    def predict(self, clouds: Sequence[np.ndarray]):
        """clouds: list of [n_i, 3] arrays -> list of per-request output
        pytrees.  Each leaf has its batch axis removed; leaves carrying a
        per-point axis (length == padded point count) are sliced back to the
        request's original length, so point padding never leaks to callers.
        """
        out, n, b, p = self.predict_padded(clouds)
        out = jax.tree_util.tree_map(np.asarray, jax.device_get(out))

        results = []
        for i, cloud in enumerate(clouds[:n]):
            n_pts = int(np.asarray(cloud).shape[0])

            def trim(leaf, i=i, n_pts=n_pts):
                if not hasattr(leaf, "ndim") or leaf.ndim == 0 or \
                        leaf.shape[0] != b:
                    return leaf  # no batch axis (scalar stats etc.)
                leaf_i = leaf[i]
                if leaf_i.ndim >= 1 and leaf_i.shape[0] == p:
                    leaf_i = leaf_i[: min(n_pts, p)]
                return leaf_i

            results.append(jax.tree_util.tree_map(trim, out))
        return results

    def classify(self, clouds: Sequence[np.ndarray]):
        """-> class probabilities [len(clouds), n_classes]."""
        (class_pred, _mask, _stats), n, _b, _p = self.predict_padded(clouds)
        return np.asarray(jax.nn.softmax(class_pred, axis=-1))[:n]
