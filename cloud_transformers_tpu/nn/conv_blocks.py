"""Grouped dense-grid convolution blocks (2D and 3D), channel-last.

References: /root/reference/layers/v2v_groups.py (V2V-PoseNet-style 3D blocks)
and /root/reference/unet2d/unet_parts.py:9-46 (2D residual blocks).  One set of
dimension-generic flax modules replaces both torch files: ``nn.Conv`` with a
``(3,)*dim`` kernel handles 2D and 3D alike, grids are ``[B, *spatial, C]``.
"""

from typing import Sequence, Tuple, Union

import flax.linen as nn
import jax
import numpy as np

from cloud_transformers_tpu.nn.init import torch_kernel_init
from cloud_transformers_tpu.nn.precision import MXUConv


class GroupedConvTranspose(nn.Module):
    """Transposed conv with feature groups (flax's ConvTranspose lacks
    ``feature_group_count``): implemented as an input-dilated
    ``conv_general_dilated``, which XLA lowers to the same MXU program.
    Supports the k=2, s=2 exact-doubling case the V2V blocks use."""

    features: int
    kernel_size: int = 2
    stride: int = 2
    groups: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        dim = x.ndim - 2
        k, s = self.kernel_size, self.stride
        assert k == s, "only the exact-upsampling k == s case is supported"
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", torch_kernel_init(),
            (k,) * dim + (in_ch // self.groups, self.features))
        from cloud_transformers_tpu.ops.conv_safe import conv_general_safe
        out = conv_general_safe(
            x, kernel, window_strides=(1,) * dim,
            padding=[(k - 1, k - 1)] * dim, lhs_dilation=(s,) * dim,
            dimension_numbers=(("NHWC", "HWIO", "NHWC") if dim == 2 else
                               ("NDHWC", "DHWIO", "NDHWC")),
            feature_group_count=self.groups)
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (self.features,))
        return out


def _bn(train, name=None):
    from cloud_transformers_tpu.nn.norm import TorchBatchNorm
    return TorchBatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, name=name)


class BasicBlock(nn.Module):
    """Conv(k) -> BN -> ReLU (v2v_groups.py:7-19 / unet_parts.py:34-46)."""

    out_planes: int
    kernel_size: int = 3
    groups: int = 1
    dim: int = 3

    @nn.compact
    def __call__(self, x, train=True):
        x = MXUConv(self.out_planes, kernel_size=(self.kernel_size,) * self.dim,
                    padding=(self.kernel_size - 1) // 2,
                    feature_group_count=self.groups, use_bias=False,
                    kernel_init=torch_kernel_init())(x)
        return nn.relu(_bn(train)(x))


class ResBlock(nn.Module):
    """[conv-BN-ReLU-conv-BN] + skip (1x1 conv-BN if channels change), ReLU
    (v2v_groups.py:22-44 / unet_parts.py:9-31)."""

    out_planes: int
    groups: int = 1
    dim: int = 3

    @nn.compact
    def __call__(self, x, train=True):
        res = MXUConv(self.out_planes, kernel_size=(3,) * self.dim, padding=1,
                      feature_group_count=self.groups, use_bias=False,
                      kernel_init=torch_kernel_init())(x)
        res = nn.relu(_bn(train)(res))
        res = MXUConv(self.out_planes, kernel_size=(3,) * self.dim, padding=1,
                      feature_group_count=self.groups, use_bias=False,
                      kernel_init=torch_kernel_init())(res)
        res = _bn(train)(res)

        if x.shape[-1] == self.out_planes:
            skip = x
        else:
            skip = MXUConv(self.out_planes, kernel_size=(1,) * self.dim,
                           feature_group_count=self.groups, use_bias=False,
                           kernel_init=torch_kernel_init())(x)
            skip = _bn(train)(skip)
        return nn.relu(res + skip)


def max_pool_nd(x, window):
    """Max-pool with equal window/stride over all spatial dims of
    [B, *spatial, C].

    Non-overlapping pooling is computed as reshape+max instead of
    ``lax.reduce_window``: the reduce-window backward lowers to TPU
    select-and-scatter (slow, like all scatters); the reshape form's
    backward is an elementwise compare-select."""
    dim = x.ndim - 2
    spatial = x.shape[1:-1]
    assert all(s % window == 0 for s in spatial), (spatial, window)
    shape = [x.shape[0]]
    for s in spatial:
        shape += [s // window, window]
    shape.append(x.shape[-1])
    reshaped = x.reshape(shape)
    axes = tuple(2 + 2 * i for i in range(dim))
    return reshaped.max(axis=axes)


class UpsampleBlock(nn.Module):
    """ConvTranspose(k=2, s=2) -> BN -> ReLU (v2v_groups.py:56-70)."""

    out_planes: int
    groups: int = 1
    dim: int = 3

    @nn.compact
    def __call__(self, x, train=True):
        x = GroupedConvTranspose(self.out_planes, kernel_size=2, stride=2,
                                 groups=self.groups, use_bias=False)(x)
        return nn.relu(_bn(train)(x))


# --- 2D / 3D aliases matching the reference naming ---

class Basic3DBlock(BasicBlock):
    dim: int = 3


class Res3DBlock(ResBlock):
    dim: int = 3


class Basic2DBlock(BasicBlock):
    dim: int = 2


class Res2DBlock(ResBlock):
    dim: int = 2


class Pool3DBlock(nn.Module):
    pool_size: int = 2

    def __call__(self, x, train=True):
        return max_pool_nd(x, self.pool_size)


class Upsample3DBlock(UpsampleBlock):
    dim: int = 3


class V2VModel(nn.Module):
    """Full V2V-PoseNet hourglass (v2v_groups.py:73-169): front res stack,
    4-level pool/upsample encoder-decoder with res-block skip connections,
    back res stack, 1x1 output conv."""

    input_channels: int
    output_channels: int
    groups: int = 1

    @nn.compact
    def __call__(self, x, train=True):
        g = self.groups
        x = BasicBlock(32 * g, 3, g, 3)(x, train)
        for _ in range(3):
            x = ResBlock(32 * g, g, 3)(x, train)

        # encoder-decoder with skips
        skip0 = ResBlock(32 * g, g, 3)(x, train)
        x = max_pool_nd(x, 2)
        x = ResBlock(32 * g, g, 3)(x, train)
        skip1 = ResBlock(32 * g, g, 3)(x, train)
        x = max_pool_nd(x, 2)
        x = ResBlock(64 * g, g, 3)(x, train)
        skip2 = ResBlock(64 * g, g, 3)(x, train)
        x = max_pool_nd(x, 2)
        x = ResBlock(128 * g, g, 3)(x, train)
        skip3 = ResBlock(128 * g, g, 3)(x, train)
        x = max_pool_nd(x, 2)
        x = ResBlock(128 * g, g, 3)(x, train)

        x = ResBlock(128 * g, g, 3)(x, train)  # mid

        x = ResBlock(128 * g, g, 3)(x, train)
        x = UpsampleBlock(128 * g, g, 3)(x, train) + skip3
        x = ResBlock(128 * g, g, 3)(x, train)
        x = UpsampleBlock(64 * g, g, 3)(x, train) + skip2
        x = ResBlock(64 * g, g, 3)(x, train)
        x = UpsampleBlock(32 * g, g, 3)(x, train) + skip1
        x = ResBlock(32 * g, 1, 3)(x, train)  # decoder_res0 has groups=1 in ref
        x = UpsampleBlock(32 * g, g, 3)(x, train) + skip0

        for _ in range(3):
            x = ResBlock(32 * g, g, 3)(x, train)
        return MXUConv(self.output_channels * g, kernel_size=(1, 1, 1),
                       feature_group_count=g, use_bias=True,
                       kernel_init=torch_kernel_init())(x)
