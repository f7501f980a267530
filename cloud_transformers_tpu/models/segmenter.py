"""S3DIS semantic segmentation models.

References:
* /root/reference/model_zoo/s3dis/segmenter.py — 1x1-block protocol: input
  [B, P, 6] (xyz+rgb), keys driven by xyz, per-point 13-class logits.
* /root/reference/model_zoo/s3dis/segmenter_pad.py — KPConv protocol: input
  is cat(xyz, features[4]) = 7 channels, with a padding mask so splat/slice
  ignore padded points.
"""

import flax.linen as nn
import jax.numpy as jnp

from cloud_transformers_tpu.models import register
from cloud_transformers_tpu.models.classifier import MHCTTrunk
from cloud_transformers_tpu.nn.init import torch_kernel_init, torch_bias_init
from cloud_transformers_tpu.nn.multihead import _bn
from cloud_transformers_tpu.nn.precision import MXUDense


class _SegmenterBase(nn.Module):
    n_classes: int = 13
    in_channels: int = 6
    model_dim: int = 512
    remat: bool = True
    remat_policy: str = "point_io"  # see MHCTTrunk.remat_policy
    # trunk size knobs (defaults = production; tiny values for dry runs)
    repeats: int = 4
    stage_plan: tuple = None

    @nn.compact
    def _forward(self, pcd_features, xyz, pts_mask, train):
        x = MXUDense(self.model_dim, use_bias=True,
                     kernel_init=torch_kernel_init(),
                     bias_init=torch_bias_init(self.in_channels),
                     name="stem")(pcd_features)
        x = nn.relu(_bn(train, name="stem_bn")(x))

        trunk_kwargs = {} if self.stage_plan is None else {
            "stage_plan": self.stage_plan}
        x, stats = MHCTTrunk(model_dim=self.model_dim, remat=self.remat,
                             remat_policy=self.remat_policy,
                             repeats=self.repeats,
                             name="trunk", **trunk_kwargs)(
                                 x, xyz, pts_mask, train)

        x = MXUDense(self.model_dim, use_bias=False,
                     kernel_init=torch_kernel_init(), name="final_conv1")(x)
        x = nn.relu(_bn(train, name="final_bn")(x))
        logits = MXUDense(self.n_classes, kernel_init=torch_kernel_init(),
                          bias_init=torch_bias_init(self.model_dim),
                          name="final_conv2")(x)
        return logits, stats


@register("s3dis_segmenter")
class Segmenter(_SegmenterBase):
    """1x1 protocol: ``__call__(pcd [B,P,6])`` -> ([B,P,n_classes], stats)."""

    def __call__(self, pcd, train=True):
        return self._forward(pcd, pcd[..., :3], None, train)


@register("s3dis_segmenter_pad")
class SegmenterPad(_SegmenterBase):
    """KPConv protocol: ``__call__(points [B,P,3], pts_mask [B,P],
    features [B,P,4])`` -> ([B,P,n_classes], stats)."""

    in_channels: int = 7

    def __call__(self, points, pts_mask, features, train=True):
        pcd = jnp.concatenate([points, features], axis=-1)
        return self._forward(pcd, points, pts_mask, train)
