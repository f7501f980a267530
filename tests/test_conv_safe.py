"""Partitioner-safe grouped conv (ops/conv_safe.py).

Regression for an XLA SPMD bug (jax 0.9.0): under a multi-axis mesh with an
axis unused by the op, the native grouped-conv *kernel* gradient comes back
exactly unused_axis_size x too large.  ``conv_general_safe`` must (a) equal
the native op everywhere, and (b) produce mesh-independent gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from cloud_transformers_tpu.ops import conv_safe
from cloud_transformers_tpu.ops.conv_safe import conv_general_safe
from cloud_transformers_tpu.parallel.mesh import make_mesh


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def _loss_grads(conv_fn, x, k):
    def loss(k, x):
        return jnp.sum(conv_fn(x, k) ** 2)
    return jax.jit(jax.grad(loss, argnums=(0, 1)))(k, x)


@pytest.mark.parametrize("dim,groups", [(2, 2), (2, 4), (3, 2)])
def test_native_grouped_kernel_grad_is_wrong_on_multiaxis_mesh(
        rng, dim, groups):
    """Documents the underlying XLA bug: if this starts passing, the
    workaround in conv_safe can be retired."""
    b, s, c = 4, 6, 8
    x = rng.randn(b, *([s] * dim), c).astype(np.float32)
    k = rng.randn(*([3] * dim), c // groups, c).astype(np.float32)
    dn = (("NHWC", "HWIO", "NHWC") if dim == 2
          else ("NDHWC", "DHWIO", "NDHWC"))

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1,) * dim, "SAME", dimension_numbers=dn,
            feature_group_count=groups)

    def run(mesh):
        with mesh:
            kd = jax.device_put(k, NamedSharding(mesh, P()))
            spec = P("data", *([None] * (dim + 1)))
            xd = jax.device_put(x, NamedSharding(mesh, spec))
            dk, _ = _loss_grads(conv, xd, kd)
            return np.asarray(jax.device_get(dk))

    g1 = run(make_mesh(n_data=1, n_points=1, devices=jax.devices()[:1]))
    gN = run(make_mesh(n_data=4, n_points=2))
    ratio = np.nanmedian(gN / np.where(np.abs(g1) > 1e-6, g1, np.nan))
    assert np.isclose(ratio, 2.0, atol=0.01), (
        f"XLA grouped-conv kernel-grad bug appears fixed (ratio={ratio}); "
        "conv_safe's workaround can be retired")


@pytest.mark.parametrize("dim,groups", [(2, 2), (2, 4), (3, 2)])
def test_safe_grouped_kernel_grad_matches_single_device(rng, dim, groups):
    b, s, c = 4, 6, 8
    x = rng.randn(b, *([s] * dim), c).astype(np.float32)
    k = rng.randn(*([3] * dim), c // groups, c).astype(np.float32)
    dn = (("NHWC", "HWIO", "NHWC") if dim == 2
          else ("NDHWC", "DHWIO", "NDHWC"))

    def conv(x, k):
        return conv_general_safe(
            x, k, window_strides=(1,) * dim, padding="SAME",
            dimension_numbers=dn, feature_group_count=groups)

    def run(mesh):
        with mesh:
            kd = jax.device_put(k, NamedSharding(mesh, P()))
            spec = P("data", *([None] * (dim + 1)))
            xd = jax.device_put(x, NamedSharding(mesh, spec))
            dk, dx = _loss_grads(conv, xd, kd)
            return (np.asarray(jax.device_get(dk)),
                    np.asarray(jax.device_get(dx)))

    dk1, dx1 = run(make_mesh(n_data=1, n_points=1,
                             devices=jax.devices()[:1]))
    dkN, dxN = run(make_mesh(n_data=4, n_points=2))
    # tolerances scale with the grad magnitude (f32 accumulation order
    # differs across shardings); the bug being regressed is a clean 2x
    np.testing.assert_allclose(dkN, dk1, rtol=1e-3,
                               atol=1e-4 * np.abs(dk1).max())
    np.testing.assert_allclose(dxN, dx1, rtol=1e-3,
                               atol=1e-4 * np.abs(dx1).max())


def test_safe_path_matches_native_values_and_grads(rng, monkeypatch):
    """Force the custom_vjp path (no mesh) and check fwd/bwd equal native."""
    monkeypatch.setattr(conv_safe, "_mesh_is_multi_axis", lambda: True)
    b, s, c, groups = 3, 8, 8, 4
    x = rng.randn(b, s, s, c).astype(np.float32)
    k = rng.randn(3, 3, c // groups, c).astype(np.float32)
    dn = ("NHWC", "HWIO", "NHWC")

    def native(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (2, 2), "SAME", lhs_dilation=None,
            dimension_numbers=dn, feature_group_count=groups)

    def safe(x, k):
        return conv_general_safe(
            x, k, window_strides=(2, 2), padding="SAME",
            dimension_numbers=dn, feature_group_count=groups)

    np.testing.assert_allclose(np.asarray(safe(x, k)),
                               np.asarray(native(x, k)), rtol=1e-5,
                               atol=1e-5)
    dk_n, dx_n = _loss_grads(native, x, k)
    dk_s, dx_s = _loss_grads(safe, x, k)
    np.testing.assert_allclose(np.asarray(dk_s), np.asarray(dk_n),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dx_s), np.asarray(dx_n),
                               rtol=1e-4, atol=1e-5)


def test_safe_path_transpose_conv(rng, monkeypatch):
    """lhs_dilation (grouped ConvTranspose) through the safe path."""
    monkeypatch.setattr(conv_safe, "_mesh_is_multi_axis", lambda: True)
    b, s, c, groups = 2, 4, 8, 2
    x = rng.randn(b, s, s, s, c).astype(np.float32)
    k = rng.randn(2, 2, 2, c // groups, c).astype(np.float32)
    dn = ("NDHWC", "DHWIO", "NDHWC")

    def native(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1, 1), [(1, 1)] * 3, lhs_dilation=(2, 2, 2),
            dimension_numbers=dn, feature_group_count=groups)

    def safe(x, k):
        return conv_general_safe(
            x, k, window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
            lhs_dilation=(2, 2, 2), dimension_numbers=dn,
            feature_group_count=groups)

    np.testing.assert_allclose(np.asarray(safe(x, k)),
                               np.asarray(native(x, k)), rtol=1e-5,
                               atol=1e-5)
    dk_n, dx_n = _loss_grads(native, x, k)
    dk_s, dx_s = _loss_grads(safe, x, k)
    np.testing.assert_allclose(np.asarray(dk_s), np.asarray(dk_n),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dx_s), np.asarray(dx_n),
                               rtol=1e-4, atol=1e-5)


def test_mxuconv_matches_nn_conv(rng):
    """The standalone MXUConv must equal flax nn.Conv (same params)."""
    import flax.linen as nn

    from cloud_transformers_tpu.nn.precision import MXUConv

    for ksize, strides, padding, groups in [
            ((3, 3), 1, 1, 1), ((3, 3), 2, 1, 2), ((1, 1), 1, "SAME", 1),
            ((7, 7), 2, 3, 1), ((3, 3, 3), 1, 1, 2)]:
        dim = len(ksize)
        x = rng.randn(2, *([8] * dim), 8).astype(np.float32)
        ours = MXUConv(8, kernel_size=ksize, strides=strides,
                       padding=padding, feature_group_count=groups,
                       use_bias=True)
        ref = nn.Conv(8, kernel_size=ksize,
                      strides=(strides,) * dim if isinstance(strides, int)
                      else strides,
                      padding=padding, feature_group_count=groups,
                      use_bias=True)
        v = ours.init(jax.random.PRNGKey(0), x)
        out_ours = ours.apply(v, x)
        out_ref = ref.apply(v, x)
        assert out_ours.shape == out_ref.shape, (ksize, strides, padding)
        np.testing.assert_allclose(np.asarray(out_ours), np.asarray(out_ref),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=str((ksize, strides, padding)))
