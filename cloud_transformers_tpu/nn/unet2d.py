"""Grouped 2D UNet, channel-last flax.

References: /root/reference/unet2d/unet_parts.py and unet_model.py.
``GroupCat`` interleaves per-group channels when concatenating skip features so
grouped convolutions keep group alignment (unet_parts.py:126-150).  The UNet
has a global-feature bottleneck (avg-pool -> linear -> broadcast add,
unet_model.py:36) and is exposed for parity although the reference model zoo
only uses Res2DBlock/Basic2DBlock.
"""

import flax.linen as nn
import jax.numpy as jnp

from cloud_transformers_tpu.nn.conv_blocks import _bn, max_pool_nd
from cloud_transformers_tpu.nn.init import torch_kernel_init
from cloud_transformers_tpu.nn.precision import MXUConv, MXUDense


def group_cat(x1, x2, groups):
    """Concat [B,H,W,C1] and [B,H,W,C2] interleaving per-group channels."""
    b, h, w, c1 = x1.shape
    c2 = x2.shape[-1]
    r1 = x1.reshape(b, h, w, groups, c1 // groups)
    r2 = x2.reshape(b, h, w, groups, c2 // groups)
    return jnp.concatenate([r1, r2], axis=-1).reshape(b, h, w, c1 + c2)


class GroupCat(nn.Module):
    groups: int

    def __call__(self, x1, x2):
        return group_cat(x1, x2, self.groups)


class DoubleConv(nn.Module):
    """(conv3x3 -> BN -> ReLU) x2 (unet_parts.py:49-65)."""

    out_channels: int
    groups: int

    @nn.compact
    def __call__(self, x, train=True):
        for _ in range(2):
            x = MXUConv(self.out_channels, (3, 3), padding=1,
                        feature_group_count=self.groups,
                        kernel_init=torch_kernel_init())(x)
            x = nn.relu(_bn(train)(x))
        return x


class Down(nn.Module):
    """maxpool2 -> DoubleConv (unet_parts.py:68-80)."""

    out_channels: int
    groups: int

    @nn.compact
    def __call__(self, x, train=True):
        return DoubleConv(self.out_channels, self.groups)(
            max_pool_nd(x, 2), train)


class Up(nn.Module):
    """Upsample (bilinear) -> pad to skip size -> GroupCat -> DoubleConv
    (unet_parts.py:83-112)."""

    out_channels: int
    groups: int
    bilinear: bool = True

    @nn.compact
    def __call__(self, x1, x2, train=True):
        b, h, w, c = x1.shape
        if self.bilinear:
            x1 = _resize_bilinear(x1, (h * 2, w * 2))
        else:
            from cloud_transformers_tpu.nn.conv_blocks import (
                GroupedConvTranspose)
            x1 = GroupedConvTranspose(c, kernel_size=2, stride=2,
                                      groups=self.groups, use_bias=True)(x1)
        dh = x2.shape[1] - x1.shape[1]
        dw = x2.shape[2] - x1.shape[2]
        x1 = jnp.pad(x1, ((0, 0), (dh // 2, dh - dh // 2),
                          (dw // 2, dw - dw // 2), (0, 0)))
        x = group_cat(x2, x1, self.groups)
        return DoubleConv(self.out_channels, self.groups)(x, train)


def _resize_bilinear(x, size):
    import jax.image
    return jax.image.resize(x, (x.shape[0], size[0], size[1], x.shape[-1]),
                            method="bilinear")


class OutConv(nn.Module):
    """1x1 conv -> BN (unet_parts.py:115-123)."""

    out_channels: int
    groups: int

    @nn.compact
    def __call__(self, x, train=True):
        x = MXUConv(self.out_channels, (1, 1),
                    feature_group_count=self.groups,
                    kernel_init=torch_kernel_init())(x)
        return _bn(train)(x)


class UNet(nn.Module):
    """Grouped UNet with a global-feature bottleneck (unet_model.py:8-41)."""

    n_out: int
    groups: int
    bilinear: bool = True

    @nn.compact
    def __call__(self, x, train=True):
        g = self.groups
        x1 = DoubleConv(16 * g, g)(x, train)
        x2 = Down(32 * g, g)(x1, train)
        x3 = Down(64 * g, g)(x2, train)
        x4 = Down(64 * g, g)(x3, train)
        x5 = Down(64 * g, g)(x4, train)
        pooled = jnp.mean(x5, axis=(1, 2))  # [B, 64g]
        glob = MXUDense(pooled.shape[-1],
                        kernel_init=torch_kernel_init())(pooled)
        x5 = nn.leaky_relu(x5 + glob[:, None, None, :], negative_slope=0.01)
        x = Up(64 * g, g, self.bilinear)(x5, x4, train)
        x = Up(64 * g, g, self.bilinear)(x, x3, train)
        x = Up(32 * g, g, self.bilinear)(x, x2, train)
        x = Up(16 * g, g, self.bilinear)(x, x1, train)
        return OutConv(self.n_out * g, g)(x, train)
