"""Inference engine tests (bucketing, padding, batch handling)."""

import numpy as np
import pytest

from cloud_transformers_tpu.serve import InferenceEngine, _next_bucket
from tests.test_train import TinyClassifier


def test_bucketing():
    assert _next_bucket(3, (1, 4, 8)) == 4
    assert _next_bucket(9, (1, 4, 8)) == 8  # clamps at largest
    assert _next_bucket(1, (1, 4, 8)) == 1


@pytest.mark.slow
def test_engine_classify_variable_sizes(rng):
    import jax
    import jax.numpy as jnp

    model = TinyClassifier(n_classes=5)
    pcd = jnp.zeros((1, 64, 3))
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0)}, pcd, train=False))()
    engine = InferenceEngine(model, variables, batch_buckets=(2, 4),
                             point_buckets=(64, 128))

    clouds = [rng.randn(50, 3), rng.randn(100, 3), rng.randn(64, 3)]
    probs = engine.classify(clouds)
    assert probs.shape == (3, 5)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
    # compiled once per bucket: reuse on same shapes
    engine.classify([rng.randn(40, 3)])
    assert len(engine._compiled) == 2


@pytest.mark.slow
def test_engine_per_point_outputs_trimmed(rng):
    """A per-point model's padding rows must be sliced away per request,
    and a batch of 3 on the 8-way mesh must shard (mesh-divisible bucket),
    not silently replicate."""
    import jax
    import jax.numpy as jnp

    from cloud_transformers_tpu.parallel.mesh import make_mesh

    model = TinyClassifier(n_classes=5)
    pcd = jnp.zeros((1, 64, 3))
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0)}, pcd, train=False))()
    mesh = make_mesh(n_data=8, n_points=1)
    engine = InferenceEngine(model, variables, batch_buckets=(2, 4),
                             point_buckets=(64, 128), mesh=mesh)

    clouds = [rng.randn(50, 3), rng.randn(100, 3), rng.randn(64, 3)]
    results = engine.predict(clouds)
    assert len(results) == 3
    for cloud, (cls_i, mask_i, _stats) in zip(clouds, results):
        n_pts = min(cloud.shape[0], 128)
        assert cls_i.shape == (5,)
        # per-point output trimmed to the request's own length
        assert mask_i.shape == (n_pts, 1), (cloud.shape, mask_i.shape)

    # bucket rounded up to a multiple of the mesh size -> real sharding
    _out, n, b, _p = engine.predict_padded(clouds)
    assert n == 3 and b % 8 == 0
