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


@pytest.mark.slow
def test_remat_policy_grad_parity():
    """The 'point_io' selective remat policy (save mapping/values/slice-out,
    recompute only the splat in the stage backward) must be numerically
    identical to full rematerialization."""
    from cloud_transformers_tpu.models.classifier import TINY_STAGE_PLAN

    kw = dict(n_classes=5, model_dim=32, repeats=2, stage_plan=TINY_STAGE_PLAN,
              pool_heads=2, pool_feature_dims=(4, 4), pool_sizes=(4, 8),
              trunk_width=4, class_dim=32, mask_dim=16)
    pcd = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 3))

    def grads_for(policy):
        m = get_model("scanobject_classifier", remat_policy=policy, **kw)
        v = m.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, pcd, train=True)

        def loss(p):
            out, _ = m.apply(
                {"params": p, "batch_stats": v["batch_stats"]}, pcd,
                train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(2)})
            return out[0].sum() + out[1].sum()

        with jax.default_matmul_precision("highest"):
            return jax.jit(jax.grad(loss))(v["params"])

    leaves_f = jax.tree_util.tree_leaves(grads_for("full"))
    leaves_p = jax.tree_util.tree_leaves(grads_for("point_io"))
    assert len(leaves_f) == len(leaves_p)
    scale = max(float(jnp.max(jnp.abs(a))) for a in leaves_f)
    worst = max(float(jnp.max(jnp.abs(a - b)))
                for a, b in zip(leaves_f, leaves_p))
    assert worst < 1e-5 * max(1.0, scale), (worst, scale)
