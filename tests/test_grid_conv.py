"""Pallas kernel-layout grouped conv vs the XLA grouped-conv oracle.

grid_conv_k must match `lax.conv_general_dilated(feature_group_count=H)`
applied on the [B, *spatial, H*F] layout — forward AND all three gradients
(input grid, kernel, bias) — since it replaces that conv inside MultiHead
(reference layers/multihead_ct.py:50-65)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cloud_transformers_tpu.core.splat_slice import (
    gridk_to_spatial,
    spatial_to_gridk,
)
from cloud_transformers_tpu.ops.pallas_grid_conv import grid_conv_k

CASES = [
    ((8, 8, 8), 4, 2),      # 3D, F < F_pad, lanes exactly 128 (ext 64)
    ((4, 6, 5), 3, 2),      # 3D, ragged sizes, padded lanes + features
    ((16, 8, 8), 16, 3),    # 3D, F == F_pad
    ((16, 16), 4, 2),       # 2D, small lanes (ext 16 < 128)
    ((8, 12), 8, 1),        # 2D, single head
]


def _mk(sizes, feat, heads, b=2, seed=0):
    dim = len(sizes)
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(seed), 4)
    gs = jax.random.normal(k1, (b,) + tuple(sizes) + (heads * feat,))
    kernel = jax.random.normal(k2, (3,) * dim + (feat, heads * feat)) * 0.3
    bias = jax.random.normal(k3, (heads * feat,)) * 0.1
    cot = jax.random.normal(k4, gs.shape)
    return gs, kernel, bias, cot


def _oracle(gs, kernel, bias, heads):
    dim = gs.ndim - 2
    dn = (("NHWC", "HWIO", "NHWC") if dim == 2
          else ("NDHWC", "DHWIO", "NDHWC"))
    out = jax.lax.conv_general_dilated(
        gs, kernel, window_strides=(1,) * dim, padding=[(1, 1)] * dim,
        dimension_numbers=dn, feature_group_count=heads,
        precision=jax.lax.Precision.HIGHEST)
    return out + bias


def _pallas(gs, kernel, bias, sizes, feat, heads):
    b = gs.shape[0]
    gk = spatial_to_gridk(gs, heads, sizes, feat)
    out_k = grid_conv_k(gk, kernel, bias, sizes, feat, heads)
    return gridk_to_spatial(out_k, b, sizes, feat)


@pytest.mark.parametrize("sizes,feat,heads", CASES)
def test_forward_matches_xla(sizes, feat, heads):
    gs, kernel, bias, _ = _mk(sizes, feat, heads)
    want = _oracle(gs, kernel, bias, heads)
    got = _pallas(gs, kernel, bias, sizes, feat, heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("sizes,feat,heads", CASES)
def test_grads_match_xla(sizes, feat, heads):
    gs, kernel, bias, cot = _mk(sizes, feat, heads)

    def loss_oracle(gs, kernel, bias):
        return jnp.sum(_oracle(gs, kernel, bias, heads) * cot)

    def loss_pallas(gs, kernel, bias):
        return jnp.sum(_pallas(gs, kernel, bias, sizes, feat, heads) * cot)

    g_ref = jax.grad(loss_oracle, argnums=(0, 1, 2))(gs, kernel, bias)
    g_got = jax.grad(loss_pallas, argnums=(0, 1, 2))(gs, kernel, bias)
    for name, a, b_ in zip(("d_grid", "d_kernel", "d_bias"), g_ref, g_got):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), rtol=1e-4, atol=1e-4,
            err_msg=f"{name} mismatch for sizes={sizes}")


def test_pad_lanes_and_rows_zero():
    """The conv output must keep the kernel layout's invariant: zero in the
    lane padding and the feature-pad rows (the downstream slice kernel and
    kernel_to_flat rely on it)."""
    sizes, feat, heads = (4, 6, 5), 3, 2
    gs, kernel, bias, _ = _mk(sizes, feat, heads)
    gk = spatial_to_gridk(gs, heads, sizes, feat)
    out_k = grid_conv_k(gk, kernel, bias, sizes, feat, heads)
    from cloud_transformers_tpu.ops.pallas_splat import kernel_grid_dims
    x_dim, ext, lanes, f_pad = kernel_grid_dims(sizes, feat)
    o4 = np.asarray(out_k).reshape(-1, x_dim, f_pad, lanes)
    assert np.all(o4[..., ext:] == 0.0), "lane padding not zero"
    assert np.all(o4[:, :, feat:, :] == 0.0), "feature pad rows not zero"
