"""Model zoo golden tests: tiny-config forward shapes + registry
(SURVEY.md §4 item 4). Full-size models are exercised on TPU by bench.py;
here we use few points to keep CPU compile time sane."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cloud_transformers_tpu.models import get_model, available_models


P = 64  # few points; model size is dominated by channels, not P


@pytest.fixture(scope="module")
def keys():
    k = jax.random.PRNGKey(0)
    return {"params": k, "dropout": jax.random.PRNGKey(1)}


def test_registry_contents():
    names = available_models()
    for expected in ["scanobject_classifier", "scanobject_classifier_scales",
                     "s3dis_segmenter", "s3dis_segmenter_pad",
                     "completion_inpainter", "image_reconstructor"]:
        assert expected in names
    # reference generator paths resolve too
    m = get_model("./model_zoo/scanobject/classifier.py")
    assert type(m).__name__ == "Classifier"


def test_unknown_model_raises():
    with pytest.raises(KeyError):
        get_model("nope")


@pytest.mark.slow
def test_classifier_forward(keys):
    model = get_model("scanobject_classifier", n_classes=15)
    pcd = jax.random.normal(jax.random.PRNGKey(2), (1, P, 3))
    variables = model.init(keys, pcd, train=False)
    cls, mask, stats = model.apply(variables, pcd, train=False)
    assert cls.shape == (1, 15)
    assert mask.shape == (1, P, 1)
    assert len(stats) == 26  # 12 blocks x 2 head-groups + 2 pools


@pytest.mark.slow
def test_segmenter_forward(keys):
    model = get_model("s3dis_segmenter", n_classes=13)
    pcd = jax.random.normal(jax.random.PRNGKey(2), (1, P, 6))
    variables = model.init(keys, pcd, train=False)
    logits, stats = model.apply(variables, pcd, train=False)
    assert logits.shape == (1, P, 13)


@pytest.mark.slow
def test_segmenter_pad_forward(keys):
    model = get_model("s3dis_segmenter_pad", n_classes=13)
    pts = jax.random.normal(jax.random.PRNGKey(2), (1, P, 3))
    feats = jax.random.normal(jax.random.PRNGKey(3), (1, P, 4))
    mask = jnp.asarray(np.r_[np.ones(P // 2), np.zeros(P // 2)][None])
    variables = model.init(keys, pts, mask, feats, train=False)
    logits, stats = model.apply(variables, pts, mask, feats, train=False)
    assert logits.shape == (1, P, 13)


@pytest.mark.slow
def test_inpainter_forward(keys):
    model = get_model("completion_inpainter", num_latent=512)
    noise = jax.random.normal(jax.random.PRNGKey(2), (1, P, 4))
    partial = jax.random.normal(jax.random.PRNGKey(3), (1, P // 2, 3))
    variables = model.init(keys, noise, partial, train=False)
    out, stats = model.apply(variables, noise, partial, train=False)
    assert out.shape == (1, P, 3)


@pytest.mark.slow
def test_reconstructor_forward(keys):
    model = get_model("image_reconstructor", num_latent=512)
    noise = jax.random.normal(jax.random.PRNGKey(2), (1, P, 3))
    img = jax.random.normal(jax.random.PRNGKey(3), (1, 64, 64, 3))
    variables = model.init(keys, noise, img, train=False)
    out, stats = model.apply(variables, noise, img, train=False)
    assert out.shape == (1, P, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
