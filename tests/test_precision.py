"""Mixed-precision policy (nn/precision.py): bf16 contractions keep float32
params/outputs and identical parameter trees."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cloud_transformers_tpu.nn import precision
from cloud_transformers_tpu.nn.conv_blocks import ResBlock
from cloud_transformers_tpu.nn.grouped_conv import GroupedConv
from cloud_transformers_tpu.nn.precision import MXUDense


@pytest.fixture(autouse=True)
def _reset_policy():
    yield
    precision.set_default_mxu_dtype(None)


def test_mxu_dense_matches_dense_tree_and_f32():
    import flax.linen as nn
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16))
    ref = nn.Dense(8)
    v_ref = ref.init(jax.random.PRNGKey(1), x)
    mine = MXUDense(8)
    v = mine.init(jax.random.PRNGKey(1), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        v_ref)
    # identical rng + init -> identical params -> identical f32 output
    np.testing.assert_allclose(np.asarray(mine.apply(v, x)),
                               np.asarray(ref.apply(v_ref, x)), atol=1e-6)


def test_bf16_policy_close_and_f32_out():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64))
    m = MXUDense(32)
    v = m.init(jax.random.PRNGKey(1), x)
    o32 = m.apply(v, x)
    precision.set_default_mxu_dtype("bfloat16")
    o16 = MXUDense(32).apply(v, x)
    assert o16.dtype == jnp.float32
    rel = float(jnp.max(jnp.abs(o32 - o16)) / (jnp.max(jnp.abs(o32)) + 1e-9))
    assert 0 < rel < 0.03  # bf16 rounding, not garbage and not a no-op


def test_grouped_conv_bf16_policy():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 6, 8))
    m = GroupedConv(8, kernel_size=(3, 3), padding=1, groups=2)
    v = m.init(jax.random.PRNGKey(1), x)
    o32 = m.apply(v, x)
    precision.set_default_mxu_dtype(jnp.bfloat16)
    o16 = GroupedConv(8, kernel_size=(3, 3), padding=1, groups=2).apply(v, x)
    assert o16.dtype == jnp.float32
    rel = float(jnp.max(jnp.abs(o32 - o16)) / (jnp.max(jnp.abs(o32)) + 1e-9))
    assert rel < 0.03


def test_resblock_bf16_same_tree():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 4, 8))
    blk = ResBlock(16, groups=2, dim=3)
    v = blk.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    o32 = blk.apply(v, x, train=False)
    precision.set_default_mxu_dtype("bfloat16")
    o16 = ResBlock(16, groups=2, dim=3).apply(v, x, train=False)
    rel = float(jnp.max(jnp.abs(o32 - o16)) / (jnp.max(jnp.abs(o32)) + 1e-9))
    assert rel < 0.05
