"""ResNet-50 image encoder, channel-last flax.

The reference's single-view reconstructor uses a torchvision ResNet50 trunk
(/root/reference/model_zoo/image_reconstruction/reconstructor.py:16-33,
children()[:-2] -> global average pool -> 2048-d).  This is the standard
bottleneck ResNet; ImageNet-pretrained weights can be loaded from a converted
checkpoint via the trainer's restore mechanism (no network egress here).
"""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from cloud_transformers_tpu.nn.init import torch_kernel_init
from cloud_transformers_tpu.nn.precision import MXUConv


def _bn(train, name=None, scale_init=nn.initializers.ones):
    from cloud_transformers_tpu.nn.norm import TorchBatchNorm
    return TorchBatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, scale_init=scale_init, name=name)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train=True):
        identity = x
        out = MXUConv(self.planes, (1, 1), use_bias=False,
                      kernel_init=torch_kernel_init())(x)
        out = nn.relu(_bn(train)(out))
        out = MXUConv(self.planes, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, kernel_init=torch_kernel_init())(out)
        out = nn.relu(_bn(train)(out))
        out = MXUConv(self.planes * 4, (1, 1), use_bias=False,
                      kernel_init=torch_kernel_init())(out)
        # zero-init the last BN scale (torchvision's zero_init_residual=False
        # default keeps ones; we keep ones for parity)
        out = _bn(train)(out)
        if self.downsample:
            identity = MXUConv(self.planes * 4, (1, 1), strides=self.stride,
                               use_bias=False,
                               kernel_init=torch_kernel_init())(x)
            identity = _bn(train)(identity)
        return nn.relu(out + identity)


class ResNet50(nn.Module):
    """Feature trunk: conv1..layer4 (no fc), returns [B, H/32, W/32, 2048]."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x, train=True):
        x = MXUConv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    kernel_init=torch_kernel_init())(x)
        x = nn.relu(_bn(train)(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        planes = 64
        for stage, n_blocks in enumerate(self.stage_sizes):
            for i in range(n_blocks):
                stride = 2 if (stage > 0 and i == 0) else 1
                downsample = (i == 0)
                x = Bottleneck(planes, stride=stride,
                               downsample=downsample)(x, train)
            planes *= 2
        return x


class ResNet50Features(nn.Module):
    """ResNet50 trunk -> global average pool -> [B, 2048]."""

    @nn.compact
    def __call__(self, x, train=True):
        x = ResNet50(name="trunk")(x, train)
        return jnp.mean(x, axis=(1, 2))
