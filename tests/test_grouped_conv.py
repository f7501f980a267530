"""GroupedConv: block-diagonal dense execution must equal a true grouped
conv, params and gradients included."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cloud_transformers_tpu.nn.grouped_conv as gc
from cloud_transformers_tpu.nn.grouped_conv import GroupedConv


@pytest.mark.parametrize("dim,ch,groups", [(2, 32, 8), (3, 16, 4)])
def test_block_diag_matches_native_grouped(rng, dim, ch, groups, monkeypatch):
    x = jnp.asarray(rng.randn(2, *([8] * dim), ch), jnp.float32)
    m = GroupedConv(ch, kernel_size=(3,) * dim, padding=1, groups=groups)
    v = m.init(jax.random.PRNGKey(0), x)

    out_bd = m.apply(v, x)  # per-group ch small -> block-diag path
    monkeypatch.setattr(gc, "_BLOCK_DIAG_MAX_GROUP_CH", 0)  # force native
    out_native = m.apply(v, x)
    np.testing.assert_allclose(np.asarray(out_bd), np.asarray(out_native),
                               atol=1e-4)


def test_gradients_stay_block_diagonal(rng, monkeypatch):
    x = jnp.asarray(rng.randn(1, 8, 8, 16), jnp.float32)
    m = GroupedConv(16, kernel_size=(3, 3), padding=1, groups=4)
    v = m.init(jax.random.PRNGKey(0), x)

    def loss(params):
        return jnp.sum(m.apply(params, x) ** 2)

    g_bd = jax.grad(loss)(v)
    monkeypatch.setattr(gc, "_BLOCK_DIAG_MAX_GROUP_CH", 0)
    g_native = jax.grad(loss)(v)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-4),
        g_bd, g_native)


def test_param_count_is_grouped(rng):
    # parity: params stay in grouped layout (in/g per group), not dense
    x = jnp.asarray(rng.randn(1, 8, 8, 16), jnp.float32)
    m = GroupedConv(16, kernel_size=(3, 3), padding=1, groups=4)
    v = m.init(jax.random.PRNGKey(0), x)
    assert v["params"]["kernel"].shape == (3, 3, 4, 16)
