"""Torch-checkpoint converter tests: structural match against our model tree
and numeric spot-checks of the layout transposes using torch (CPU)."""

import numpy as np
import pytest

from tools.convert_torch_checkpoint import (
    conv1d_to_dense,
    convnd_to_hwio,
    convert_segmenter_pad,
)


def synth_reference_segmenter_sd(rng, n_classes=13, model_dim=512):
    """State dict with the reference segmenter_pad's exact parameter names
    and shapes (model_zoo/s3dis/segmenter_pad.py)."""
    sd = {}

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = rng.randn(c).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.randn(c).astype(np.float32)
        sd[f"{prefix}.running_mean"] = rng.randn(c).astype(np.float32)
        sd[f"{prefix}.running_var"] = rng.rand(c).astype(np.float32) + 0.5

    sd["first_process.0.weight"] = rng.randn(model_dim, 7, 1).astype(
        np.float32)
    sd["first_process.0.bias"] = rng.randn(model_dim).astype(np.float32)
    bn("first_process.1", model_dim)

    stage = [((4, 4), (16, 16), (128, 32), (2, 3)),
             ((16, 16), (16, 16), (64, 16), (2, 3)),
             ((16, 32), (16, 16), (16, 8), (2, 3))]
    for i in range(12):
        fds, heads, _, dims = stage[i % 3]
        pre = f"attentions_encoder.{i}"
        for j, (f, h, d) in enumerate(zip(fds, heads, dims)):
            a = f"{pre}.attentions.{j}"
            sd[f"{a}.keys_values_pred.0.weight"] = rng.randn(
                h * (f + 3), model_dim, 1).astype(np.float32)
            bn(f"{a}.key_bn", h * 3)
            bn(f"{a}.values_bn", h * f)
            sd[f"{a}.transform.log_R"] = rng.randn(h, 3).astype(np.float32)
            sd[f"{a}.transform.shift"] = rng.randn(h, 3).astype(np.float32)
            ks = (3,) * d
            sd[f"{a}.conv.0.weight"] = rng.randn(
                h * f, f, *ks).astype(np.float32)
            sd[f"{a}.conv.0.bias"] = rng.randn(h * f).astype(np.float32)
            bn(f"{a}.after.0", h * f)
        total = sum(f * h for f, h in zip(fds, heads))
        sd[f"{pre}.after.0.weight"] = rng.randn(
            model_dim, total, 1).astype(np.float32)
        bn(f"{pre}.after.1", model_dim)
    sd["final.0.weight"] = rng.randn(model_dim, model_dim, 1).astype(
        np.float32)
    bn("final.1", model_dim)
    sd["final.3.weight"] = rng.randn(n_classes, model_dim, 1).astype(
        np.float32)
    sd["final.3.bias"] = rng.randn(n_classes).astype(np.float32)
    return sd


def synth_reference_classifier_sd(rng, n_classes=15, model_dim=512,
                                  prefix="", in_ch=3):
    """Classifier (model_zoo/scanobject/classifier.py) state dict; with
    ``prefix='encoder.'`` and the Linear class head this doubles as the
    completion Encoder (inpainter.py:23-116)."""
    sd = {}

    def bn(p, c):
        sd[f"{prefix}{p}.weight"] = rng.randn(c).astype(np.float32)
        sd[f"{prefix}{p}.bias"] = rng.randn(c).astype(np.float32)
        sd[f"{prefix}{p}.running_mean"] = rng.randn(c).astype(np.float32)
        sd[f"{prefix}{p}.running_var"] = rng.rand(c).astype(np.float32) + 0.5

    def resblock(p, cin, cout, g, d):
        ks = (3,) * d
        sd[f"{prefix}{p}.res_branch.0.weight"] = rng.randn(
            cout, cin // g, *ks).astype(np.float32)
        bn(f"{p}.res_branch.1", cout)
        sd[f"{prefix}{p}.res_branch.3.weight"] = rng.randn(
            cout, cout // g, *ks).astype(np.float32)
        bn(f"{p}.res_branch.4", cout)
        if cin != cout:
            sd[f"{prefix}{p}.skip_con.0.weight"] = rng.randn(
                cout, cin // g, *((1,) * d)).astype(np.float32)
            bn(f"{p}.skip_con.1", cout)

    # stem + trunk (same as segmenter but 3 input channels, no stem bias)
    seg = synth_reference_segmenter_sd(rng, model_dim=model_dim)
    for k, v in seg.items():
        if k.startswith("final") or k == "first_process.0.bias":
            continue
        if k == "first_process.0.weight":
            v = rng.randn(model_dim, in_ch, 1).astype(np.float32)
        sd[prefix + k] = v
    # pools
    for pool, f in (("pool3d", 32), ("pool2d", 16)):
        h = 16
        sd[f"{prefix}{pool}.keys_values_pred.0.weight"] = rng.randn(
            h * (f + 3), model_dim, 1).astype(np.float32)
        bn(f"{pool}.key_bn", h * 3)
        bn(f"{pool}.values_bn", h * f)
        sd[f"{prefix}{pool}.transform.log_R"] = rng.randn(h, 3).astype(
            np.float32)
        sd[f"{prefix}{pool}.transform.shift"] = rng.randn(h, 3).astype(
            np.float32)
    # Res trunks (classifier.py:74-92)
    resblock("after_pool3d.0", 512, 1024, 16, 3)
    resblock("after_pool3d.2", 1024, 1024, 16, 3)
    resblock("after_pool3d.4", 1024, 1024, 16, 3)
    resblock("after_pool2d.0", 256, 512, 16, 2)
    resblock("after_pool2d.2", 512, 1024, 16, 2)
    resblock("after_pool2d.4", 1024, 1024, 16, 2)
    if prefix:  # completion encoder head: Linear(2048,1024)+BN
        sd[f"{prefix}class_head.0.weight"] = rng.randn(1024, 2048).astype(
            np.float32)
        sd[f"{prefix}class_head.0.bias"] = rng.randn(1024).astype(np.float32)
        bn("class_head.1", 1024)
    else:  # classifier heads (classifier.py:94-107)
        sd["class_vector.0.weight"] = rng.randn(1024, 2048).astype(np.float32)
        sd["class_vector.0.bias"] = rng.randn(1024).astype(np.float32)
        bn("class_vector.1", 1024)
        sd["class_head.1.weight"] = rng.randn(n_classes, 1024).astype(
            np.float32)
        sd["class_head.1.bias"] = rng.randn(n_classes).astype(np.float32)
        sd["mask_head.1.weight"] = rng.randn(256, 512 + 1024, 1).astype(
            np.float32)
        bn("mask_head.2", 256)
        sd["mask_head.4.weight"] = rng.randn(1, 256, 1).astype(np.float32)
        sd["mask_head.4.bias"] = rng.randn(1).astype(np.float32)
    return sd


def synth_reference_inpainter_sd(rng, num_latent=512, model_dim=512):
    sd = synth_reference_classifier_sd(rng, prefix="encoder.")

    def lin(p, o, i):
        sd[f"{p}.weight"] = rng.randn(o, i).astype(np.float32)
        sd[f"{p}.bias"] = rng.randn(o).astype(np.float32)

    lin("mapping.0", num_latent, 1024)
    sd["start.0.weight"] = rng.randn(model_dim, 4, 1).astype(np.float32)
    lin("start.1.linear", model_dim * 2, num_latent)

    stage = [((4, 4), (16, 16), (128, 32), (2, 3)),
             ((16, 16), (16, 16), (64, 16), (2, 3)),
             ((16, 32), (16, 16), (16, 8), (2, 3))]
    for i in range(12):
        fds, heads, _, dims = stage[i % 3]
        pre = f"attentions_decoder.{i}"
        for j, (f, h, d) in enumerate(zip(fds, heads, dims)):
            a = f"{pre}.attentions.{j}"
            sd[f"{a}.keys_values_pred.0.weight"] = rng.randn(
                h * (f + 3), model_dim, 1).astype(np.float32)
            lin(f"{a}.keys_bn.0.linear", h * 3 * 2, num_latent)
            lin(f"{a}.values_bn.0.linear", h * f * 2, num_latent)
            sd[f"{a}.scale"] = np.float32(0.0)
            sd[f"{a}.transform.log_R"] = rng.randn(h, 3).astype(np.float32)
            sd[f"{a}.transform.shift"] = rng.randn(h, 3).astype(np.float32)
            ks = (3,) * d
            sd[f"{a}.conv.0.weight"] = rng.randn(h * f, f, *ks).astype(
                np.float32)
            sd[f"{a}.conv.0.bias"] = rng.randn(h * f).astype(np.float32)
            lin(f"{a}.after.0.linear", h * f * 2, num_latent)
        total = sum(f * h for f, h in zip(fds, heads))
        sd[f"{pre}.after.0.weight"] = rng.randn(
            model_dim, total, 1).astype(np.float32)
        lin(f"{pre}.after.1.linear", model_dim * 2, num_latent)
    sd["final.0.weight"] = rng.randn(model_dim, model_dim + 4, 1).astype(
        np.float32)
    lin("final.1.linear", model_dim * 2, num_latent)
    sd["final.3.weight"] = rng.randn(3, model_dim, 1).astype(np.float32)
    sd["final.3.bias"] = rng.randn(3).astype(np.float32)
    return sd


def tree_shapes(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(tree_shapes(v, prefix + k + "/"))
        else:
            out[prefix + k] = tuple(np.shape(v))
    return out


@pytest.mark.slow
def test_converted_tree_matches_model_structure(rng):
    import jax
    import jax.numpy as jnp
    from cloud_transformers_tpu.models import get_model

    sd = synth_reference_segmenter_sd(rng)
    params, batch_stats = convert_segmenter_pad(sd)

    model = get_model("s3dis_segmenter_pad", n_classes=13)
    pts = jnp.zeros((1, 32, 3))
    mask = jnp.ones((1, 32))
    feats = jnp.zeros((1, 32, 4))
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0)}, pts, mask, feats,
        train=False))()

    want_p = tree_shapes(jax.tree_util.tree_map(np.asarray,
                                                variables["params"]))
    got_p = tree_shapes(params)
    assert want_p == got_p, (
        set(want_p) ^ set(got_p),
        {k: (want_p.get(k), got_p.get(k))
         for k in want_p if want_p.get(k) != got_p.get(k)})
    want_s = tree_shapes(jax.tree_util.tree_map(
        np.asarray, variables["batch_stats"]))
    got_s = tree_shapes(batch_stats)
    assert want_s == got_s

    # converted weights actually run
    out, _ = model.apply({"params": params, "batch_stats": batch_stats},
                         pts, mask, feats, train=False)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow
def test_converted_classifier_tree_matches(rng):
    import jax
    import jax.numpy as jnp
    from cloud_transformers_tpu.models import get_model
    from tools.convert_torch_checkpoint import convert_classifier

    sd = synth_reference_classifier_sd(rng)
    # N(0,1) weights explode through 12 blocks; scale for a finite forward
    sd = {k: v * 0.05 if ("weight" in k and "running" not in k
                          and np.ndim(v) > 1) else v
          for k, v in sd.items()}
    params, batch_stats = convert_classifier(sd)
    model = get_model("scanobject_classifier", n_classes=15)
    pcd = jnp.zeros((1, 32, 3))
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        pcd, train=False))()
    want_p = tree_shapes(jax.tree_util.tree_map(np.asarray,
                                                variables["params"]))
    got_p = tree_shapes(params)
    assert want_p == got_p, (
        sorted(set(want_p) ^ set(got_p))[:8],
        {k: (want_p.get(k), got_p.get(k))
         for k in list(want_p)[:999] if want_p.get(k) != got_p.get(k)})
    assert tree_shapes(jax.tree_util.tree_map(
        np.asarray, variables["batch_stats"])) == tree_shapes(batch_stats)
    out = model.apply({"params": params, "batch_stats": batch_stats},
                      pcd, train=False)
    assert np.all(np.isfinite(np.asarray(out[0])))


@pytest.mark.slow
def test_converted_inpainter_tree_matches(rng):
    import jax
    import jax.numpy as jnp
    from cloud_transformers_tpu.models import get_model
    from tools.convert_torch_checkpoint import convert_inpainter

    sd = synth_reference_inpainter_sd(rng)
    params, batch_stats = convert_inpainter(sd)
    model = get_model("completion_inpainter", num_latent=512)
    noise = jnp.zeros((1, 32, 4))
    partial = jnp.zeros((1, 16, 3))
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        noise, partial, train=False))()
    want_p = tree_shapes(jax.tree_util.tree_map(np.asarray,
                                                variables["params"]))
    got_p = tree_shapes(params)
    assert want_p == got_p, (
        sorted(set(want_p) ^ set(got_p))[:8],
        {k: (want_p.get(k), got_p.get(k))
         for k in want_p if want_p.get(k) != got_p.get(k)})
    assert tree_shapes(jax.tree_util.tree_map(
        np.asarray, variables["batch_stats"])) == tree_shapes(batch_stats)


class TestLayoutTranspose:
    def test_conv1d_as_dense(self, rng):
        import torch
        conv = torch.nn.Conv1d(6, 10, 1, bias=False)
        x = rng.randn(2, 6, 5).astype(np.float32)
        want = conv(torch.from_numpy(x)).detach().numpy()
        kernel = conv1d_to_dense(conv.weight.detach().numpy())
        got = np.einsum("bcp,cd->bdp", x, kernel)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_grouped_conv2d(self, rng):
        import jax.numpy as jnp
        import torch
        from cloud_transformers_tpu.nn.grouped_conv import GroupedConv
        import jax

        conv = torch.nn.Conv2d(8, 8, 3, padding=1, groups=4)
        x = rng.randn(1, 8, 6, 6).astype(np.float32)
        want = conv(torch.from_numpy(x)).detach().numpy()  # [1, 8, 6, 6]

        m = GroupedConv(8, kernel_size=(3, 3), padding=1, groups=4)
        params = {"params": {
            "kernel": jnp.asarray(convnd_to_hwio(
                conv.weight.detach().numpy())),
            "bias": jnp.asarray(conv.bias.detach().numpy())}}
        got = m.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                                   want, atol=1e-4)

    def test_batchnorm_semantics(self, rng):
        import torch
        import flax.linen as nn
        import jax.numpy as jnp

        bn_t = torch.nn.BatchNorm1d(6).eval()
        with torch.no_grad():
            bn_t.weight.copy_(torch.randn(6))
            bn_t.bias.copy_(torch.randn(6))
            bn_t.running_mean.copy_(torch.randn(6))
            bn_t.running_var.copy_(torch.rand(6) + 0.5)
        x = rng.randn(2, 6, 5).astype(np.float32)
        want = bn_t(torch.from_numpy(x)).detach().numpy()  # [B, C, P]

        bn_f = nn.BatchNorm(use_running_average=True, momentum=0.9,
                            epsilon=1e-5)
        variables = {
            "params": {"scale": jnp.asarray(bn_t.weight.detach().numpy()),
                       "bias": jnp.asarray(bn_t.bias.detach().numpy())},
            "batch_stats": {
                "mean": jnp.asarray(bn_t.running_mean.detach().numpy()),
                "var": jnp.asarray(bn_t.running_var.detach().numpy())}}
        got = bn_f.apply(variables, jnp.asarray(x.transpose(0, 2, 1)))
        np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                                   atol=1e-4)
