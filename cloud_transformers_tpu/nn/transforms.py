"""Learned per-head coordinate frames (shift + SO(3) rotation [+ scale]).

Reference: /root/reference/layers/utils.py:9-61 (``VolTransformer`` /
``PlaneTransformer``).  Channel-last: clouds are ``[B, P, H, 3]``.
Initialization parity: ``log_R ~ N(0, 1)``, shift zeros, scales ones.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from cloud_transformers_tpu.core.so3 import so3_exponential_map


class VolTransformer(nn.Module):
    """3D frame: ``R^T (pcd + shift)`` per head (utils.py:25-34 — the
    reference einsum 'bhcp,hcn->bhnp' contracts the *row* index of R, i.e.
    applies R transposed)."""

    heads: int
    scales: bool = False

    @nn.compact
    def __call__(self, pcd):  # [B, P, H, 3]
        log_r = self.param("log_R", nn.initializers.normal(1.0),
                           (self.heads, 3))
        shift = self.param("shift", nn.initializers.zeros, (self.heads, 3))
        out = pcd + shift[None, None]
        rot = so3_exponential_map(log_r)  # [H, 3, 3]
        out = jnp.einsum("bphc,hcn->bphn", out, rot,
                         precision=jax.lax.Precision.HIGHEST)
        if self.scales:
            s = self.param("scales", nn.initializers.ones, (self.heads, 3))
            out = out * s[None, None]
        return out


class PlaneTransformer(nn.Module):
    """2D frame: rotate in 3D, keep xy (utils.py:53-61)."""

    heads: int
    scales: bool = False

    @nn.compact
    def __call__(self, pcd):  # [B, P, H, 3] -> [B, P, H, 2]
        log_r = self.param("log_R", nn.initializers.normal(1.0),
                           (self.heads, 3))
        shift = self.param("shift", nn.initializers.zeros, (self.heads, 3))
        out = pcd + shift[None, None]
        rot = so3_exponential_map(log_r)
        out = jnp.einsum("bphc,hcn->bphn", out, rot,
                         precision=jax.lax.Precision.HIGHEST)[..., :2]
        if self.scales:
            s = self.param("scales", nn.initializers.ones, (self.heads, 2))
            out = out * s[None, None]
        return out
