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
