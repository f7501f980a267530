"""Fused splat->conv->slice block: kernel correctness + VJP equivalence.

The fused kernel (ops/pallas_fused_block.py) must match the composition of
the three separate ops exactly — forward AND gradients (its custom VJP
composes the three backward kernels).  Runs in interpret mode on the CPU
mesh like the rest of the kernel suite.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import cloud_transformers_tpu.nn.grouped_conv as gc
import cloud_transformers_tpu.ops.pallas_grid_conv as pgc
import cloud_transformers_tpu.ops.pallas_splat as ps
from cloud_transformers_tpu.core import splat_slice as ss
from cloud_transformers_tpu.core.grid_mapping import grid_mapping
from cloud_transformers_tpu.ops.pallas_fused_block import pallas_fused_block

SHAPES = [((8, 8, 8), 4, 2), ((16, 16), 4, 2), ((8, 8, 8), 8, 2)]


def _inputs(rng, sizes, f, h, b=2, k=64):
    dim = len(sizes)
    r = b * h
    keys = jnp.asarray(
        rng.uniform(0, np.array(sizes) - 1.001, (r, k, dim)), jnp.float32)
    x0, lane0, w_lo, w_hi = ps.vertex_decomposition(keys, tuple(sizes))
    vals = jnp.asarray(rng.randn(r, k, f), jnp.float32)
    kern = jnp.asarray(
        rng.randn(*((3,) * dim + (f, h * f))), jnp.float32) * 0.1
    bias = jnp.asarray(rng.randn(h * f), jnp.float32) * 0.1
    return x0, lane0, w_lo, w_hi, vals, kern, bias


@pytest.mark.parametrize("sizes,f,h", SHAPES)
def test_fused_kernel_matches_composition(rng, sizes, f, h):
    x0, lane0, w_lo, w_hi, vals, kern, bias = _inputs(rng, sizes, f, h)
    gk_ref = ps.pallas_splat(x0, lane0, w_lo, w_hi, vals, tuple(sizes), f,
                             interpret=True, kernel_layout_out=True)
    gk2_ref = pgc._grid_conv(tuple(sizes), f, h, gk_ref, kern, bias)
    pts_ref = ps.pallas_slice(x0, lane0, w_lo, w_hi, gk2_ref, tuple(sizes),
                              f, interpret=True, kernel_layout_in=True)
    pts, gk, gk2 = pallas_fused_block(
        x0, lane0, w_lo, w_hi, vals, kern, bias, tuple(sizes), f, h,
        want_gk2=True, interpret=True)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk2), np.asarray(gk2_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(pts), np.asarray(pts_ref),
                               atol=1e-5)


@pytest.mark.parametrize("sizes,f,h", SHAPES[:2])
def test_fused_vjp_matches_composition(rng, sizes, f, h):
    x0, lane0, w_lo, w_hi, vals, kern, bias = _inputs(rng, sizes, f, h)

    def loss_fused(w_lo, w_hi, vals, kern, bias):
        pts, gk = ss._fused_block_mk(tuple(sizes), f, h, x0, lane0, w_lo,
                                     w_hi, vals, kern, bias)
        return jnp.sum(pts ** 2) + jnp.sum(jnp.tanh(gk))

    def loss_ops(w_lo, w_hi, vals, kern, bias):
        gk = ss._splat_mk(tuple(sizes), x0, lane0, w_lo, w_hi, vals)
        gk2 = pgc._grid_conv(tuple(sizes), f, h, gk, kern, bias)
        pts = ss._slice_mk(tuple(sizes), f, x0, lane0, w_lo, w_hi, gk2)
        return jnp.sum(pts ** 2) + jnp.sum(jnp.tanh(gk))

    args = (w_lo, w_hi, vals, kern, bias)
    l1, g1 = jax.value_and_grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
    l2, g2 = jax.value_and_grad(loss_ops, argnums=(0, 1, 2, 3, 4))(*args)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fused_module_in_multihead(rng):
    """MultiHead with block fusion forced on matches the 'ops' path
    (same params: FusedSplatConvSlice declares conv/kernel + conv/bias)."""
    from cloud_transformers_tpu.nn.multihead import MultiHead

    x = jnp.asarray(rng.randn(2, 64, 16), jnp.float32)
    pcd = jnp.asarray(rng.randn(2, 64, 3), jnp.float32)
    mh = MultiHead(in_feature_dim=4, tensor_size=8, tensor_dim=3, heads=2)
    try:
        gc.set_block_fusion("ops")
        v_ops = mh.init({"params": jax.random.PRNGKey(0)}, x, pcd,
                        train=False)
        (out_ops, _), _ = mh.apply(v_ops, x, pcd, train=False,
                                   mutable=["batch_stats"])
        gc.set_block_fusion("fused")
        v_fused = mh.init({"params": jax.random.PRNGKey(0)}, x, pcd,
                          train=False)
        # identical param trees (names AND values)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            v_ops["params"], v_fused["params"])
        (out_fused, _), _ = mh.apply(v_ops, x, pcd, train=False,
                                     mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(out_ops[0]),
                                   np.asarray(out_fused[0]), atol=1e-5)
    finally:
        gc.set_block_fusion(None)
