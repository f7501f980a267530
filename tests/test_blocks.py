"""Shape/behavior tests for the flax NN blocks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cloud_transformers_tpu.nn import (
    AdaIn1d,
    instance_norm_1d,
    VolTransformer,
    PlaneTransformer,
    MultiHead,
    MultiHeadUnion,
    MultiHeadPool,
    MultiHeadAdaIn,
    MultiHeadUnionAdaIn,
    Res2DBlock,
    Res3DBlock,
    V2VModel,
    UNet,
)


def init_apply(module, *args, train=True, **kwargs):
    key = jax.random.PRNGKey(0)
    variables = module.init(key, *args, train=train, **kwargs)
    out, updates = module.apply(variables, *args, train=train,
                                mutable=["batch_stats"], **kwargs)
    return out, variables


class TestTorchBatchNorm:
    """TorchBatchNorm must reproduce torch.nn.BatchNorm exactly — including
    the unbiased (Bessel) running-variance update that flax's BatchNorm
    omits (flax normalization.py:404 stores the biased batch var)."""

    @pytest.mark.parametrize("shape", [(16, 32), (4, 7, 12), (2, 5, 5, 6)])
    def test_matches_torch_train_and_eval(self, shape):
        import torch
        from cloud_transformers_tpu.nn.norm import TorchBatchNorm

        feat = shape[-1]
        tb = {2: torch.nn.BatchNorm1d, 3: torch.nn.BatchNorm1d,
              4: torch.nn.BatchNorm2d}[len(shape)](feat, momentum=0.1)
        with torch.no_grad():
            tb.weight.copy_(torch.rand(feat) + 0.5)
            tb.bias.copy_(torch.rand(feat) - 0.5)

        fb = TorchBatchNorm(use_running_average=False)
        rng = np.random.RandomState(0)
        x0 = rng.randn(*shape).astype(np.float32)
        variables = fb.init(jax.random.PRNGKey(0), x0)
        variables = {
            "params": {"scale": jnp.asarray(tb.weight.detach().numpy()),
                       "bias": jnp.asarray(tb.bias.detach().numpy())},
            "batch_stats": variables["batch_stats"],
        }

        def to_torch(x):
            # torch BN wants channels at dim 1
            t = torch.tensor(x)
            perm = (0, t.ndim - 1) + tuple(range(1, t.ndim - 1))
            return t.permute(perm)

        def from_torch(t):
            perm = (0,) + tuple(range(2, t.ndim)) + (1,)
            return t.permute(perm).detach().numpy()

        tb.train()
        for step in range(3):
            x = rng.randn(*shape).astype(np.float32)
            with torch.no_grad():
                t_out = from_torch(tb(to_torch(x)))
            j_out, upd = fb.apply(variables, x, mutable=["batch_stats"])
            variables = {"params": variables["params"],
                         "batch_stats": upd["batch_stats"]}
            np.testing.assert_allclose(np.asarray(j_out), t_out,
                                       atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(variables["batch_stats"]["mean"]),
            tb.running_mean.numpy(), atol=1e-6, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(variables["batch_stats"]["var"]),
            tb.running_var.numpy(), atol=1e-6, rtol=1e-5)

        tb.eval()
        x = rng.randn(*shape).astype(np.float32)
        with torch.no_grad():
            t_out = from_torch(tb(to_torch(x)))
        eval_bn = TorchBatchNorm(use_running_average=True)
        j_out = eval_bn.apply(variables, x)
        np.testing.assert_allclose(np.asarray(j_out), t_out,
                                   atol=2e-5, rtol=1e-5)


class TestNorms:
    def test_instance_norm(self, rng):
        x = jnp.asarray(rng.randn(2, 64, 8) * 5 + 3, jnp.float32)
        y = instance_norm_1d(x)
        np.testing.assert_allclose(np.asarray(jnp.mean(y, 1)), 0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(jnp.var(y, 1)), 1, atol=1e-2)

    def test_adain_shapes_and_conditioning(self, rng):
        x = jnp.asarray(rng.randn(2, 32, 8), jnp.float32)
        z1 = jnp.asarray(rng.randn(2, 16), jnp.float32)
        z2 = jnp.asarray(rng.randn(2, 16), jnp.float32)
        m = AdaIn1d(8)
        v = m.init(jax.random.PRNGKey(0), x, z1)
        y1 = m.apply(v, x, z1)
        y2 = m.apply(v, x, z2)
        assert y1.shape == x.shape
        assert float(jnp.abs(y1 - y2).max()) > 1e-6  # latent actually used


class TestTransformers:
    def test_vol_shapes(self, rng):
        pcd = jnp.asarray(rng.randn(2, 100, 4, 3), jnp.float32)
        m = VolTransformer(heads=4)
        v = m.init(jax.random.PRNGKey(0), pcd)
        out = m.apply(v, pcd)
        assert out.shape == (2, 100, 4, 3)
        # pure rotation at zero shift: norms preserved
        v2 = jax.tree_util.tree_map(lambda a: a, v)
        out0 = m.apply(v2, pcd)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out0), axis=-1),
            np.linalg.norm(np.asarray(pcd), axis=-1), atol=1e-3)

    def test_plane_returns_2d(self, rng):
        pcd = jnp.asarray(rng.randn(2, 10, 4, 3), jnp.float32)
        m = PlaneTransformer(heads=4, scales=True)
        v = m.init(jax.random.PRNGKey(0), pcd)
        assert m.apply(v, pcd).shape == (2, 10, 4, 2)


class TestMultiHead:
    def test_multihead_forward(self, rng):
        x = jnp.asarray(rng.randn(2, 128, 32), jnp.float32)
        pcd = jnp.asarray(rng.randn(2, 128, 3), jnp.float32)
        m = MultiHead(in_feature_dim=4, tensor_size=8, tensor_dim=3, heads=2)
        (out, stats), _ = init_apply(m, x, pcd)
        assert out.shape == (2, 128, 8)
        assert set(stats) == {"occupancy", "key_mean", "key_var"}
        assert float(stats["occupancy"]) > 0

    def test_multihead_2d(self, rng):
        x = jnp.asarray(rng.randn(2, 128, 32), jnp.float32)
        pcd = jnp.asarray(rng.randn(2, 128, 3), jnp.float32)
        m = MultiHead(in_feature_dim=4, tensor_size=16, tensor_dim=2, heads=2)
        (out, _), _ = init_apply(m, x, pcd)
        assert out.shape == (2, 128, 8)

    def test_union_residual_shape(self, rng):
        x = jnp.asarray(rng.randn(2, 64, 32), jnp.float32)
        pcd = jnp.asarray(rng.randn(2, 64, 3), jnp.float32)
        m = MultiHeadUnion(model_dim=32, features_dims=[4, 4], heads=[2, 2],
                           tensor_sizes=[16, 8], tensor_dims=[2, 3],
                           model_dim_out=32)
        (out, stats), _ = init_apply(m, x, pcd)
        assert out.shape == (2, 64, 32)
        assert len(stats) == 2

    def test_union_projection_shortcut(self, rng):
        x = jnp.asarray(rng.randn(2, 64, 32), jnp.float32)
        pcd = jnp.asarray(rng.randn(2, 64, 3), jnp.float32)
        m = MultiHeadUnion(model_dim=32, features_dims=[4], heads=[2],
                           tensor_sizes=[8], tensor_dims=[3],
                           model_dim_out=48)
        (out, _), variables = init_apply(m, x, pcd)
        assert out.shape == (2, 64, 48)
        assert "shortcut_conv" in variables["params"]

    def test_key_bn_zero_init_keys_equal_geometry(self, rng):
        # At init the key BN scale is zero, so lattice coords must equal
        # tanh(Transform(orig_pcd)) independent of x
        # (reference multihead_ct.py:79-80).
        pcd = jnp.asarray(rng.randn(1, 64, 3), jnp.float32)
        m = MultiHead(in_feature_dim=4, tensor_size=8, tensor_dim=3, heads=2)
        x1 = jnp.asarray(rng.randn(1, 64, 32), jnp.float32)
        x2 = jnp.asarray(rng.randn(1, 64, 32), jnp.float32)
        key = jax.random.PRNGKey(3)
        v = m.init(key, x1, pcd, train=False)
        (o1, s1) = m.apply(v, x1, pcd, train=False)
        (o2, s2) = m.apply(v, x2, pcd, train=False)
        np.testing.assert_allclose(float(s1["key_mean"]),
                                   float(s2["key_mean"]), atol=1e-6)
        np.testing.assert_allclose(float(s1["key_var"]),
                                   float(s2["key_var"]), atol=1e-6)

    def test_pool_returns_grid(self, rng):
        x = jnp.asarray(rng.randn(2, 64, 32), jnp.float32)
        pcd = jnp.asarray(rng.randn(2, 64, 3), jnp.float32)
        m = MultiHeadPool(in_feature_dim=4, tensor_size=8, tensor_dim=3,
                          heads=2)
        (out, _), _ = init_apply(m, x, pcd)
        assert out.shape == (2, 8, 8, 8, 8)

    def test_mask_blocks_padded_points(self, rng):
        x = jnp.asarray(rng.randn(1, 64, 32), jnp.float32)
        pcd = jnp.asarray(rng.randn(1, 64, 3), jnp.float32)
        mask = jnp.asarray(np.r_[np.ones(32), np.zeros(32)][None])
        m = MultiHead(in_feature_dim=4, tensor_size=8, tensor_dim=3, heads=2)
        v = m.init(jax.random.PRNGKey(0), x, pcd, train=False)
        out, _ = m.apply(v, x, pcd, pts_mask=mask, train=False)
        np.testing.assert_allclose(np.asarray(out[0, 32:]), 0.0)


class TestAdaIn:
    def test_adain_multihead(self, rng):
        x = jnp.asarray(rng.randn(2, 64, 32), jnp.float32)
        z = jnp.asarray(rng.randn(2, 16), jnp.float32)
        pcd = jnp.asarray(rng.randn(2, 64, 3), jnp.float32)
        m = MultiHeadAdaIn(in_feature_dim=4, tensor_size=8, tensor_dim=3,
                           heads=2)
        key = jax.random.PRNGKey(0)
        v = m.init(key, x, z, pcd, train=False)
        out, stats = m.apply(v, x, z, pcd, train=False)
        assert out.shape == (2, 64, 8)
        # scale param initialized to zero
        assert float(v["params"]["scale"]) == 0.0

    def test_adain_union(self, rng):
        x = jnp.asarray(rng.randn(2, 64, 32), jnp.float32)
        z = jnp.asarray(rng.randn(2, 16), jnp.float32)
        pcd = jnp.asarray(rng.randn(2, 64, 3), jnp.float32)
        m = MultiHeadUnionAdaIn(model_dim=32, features_dims=[4, 4],
                                heads=[2, 2], tensor_sizes=[16, 8],
                                tensor_dims=[2, 3])
        v = m.init(jax.random.PRNGKey(0), x, z, pcd, train=False)
        out, stats = m.apply(v, x, z, pcd, train=False)
        assert out.shape == (2, 64, 32)


class TestConvBlocks:
    def test_res3d(self, rng):
        x = jnp.asarray(rng.randn(1, 8, 8, 8, 16), jnp.float32)
        (out), _ = init_apply(Res3DBlock(out_planes=32, groups=2), x)
        assert out.shape == (1, 8, 8, 8, 32)

    def test_res2d_identity_skip(self, rng):
        x = jnp.asarray(rng.randn(1, 8, 8, 16), jnp.float32)
        out, _ = init_apply(Res2DBlock(out_planes=16, groups=2), x)
        assert out.shape == (1, 8, 8, 16)

    def test_v2v(self, rng):
        x = jnp.asarray(rng.randn(1, 16, 16, 16, 4), jnp.float32)
        out, _ = init_apply(V2VModel(input_channels=2, output_channels=3,
                                     groups=2), x)
        assert out.shape == (1, 16, 16, 16, 6)

    def test_unet(self, rng):
        x = jnp.asarray(rng.randn(1, 32, 32, 8), jnp.float32)
        out, _ = init_apply(UNet(n_out=3, groups=2), x)
        assert out.shape == (1, 32, 32, 6)
