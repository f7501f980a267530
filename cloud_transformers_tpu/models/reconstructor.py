"""Single-view image -> point cloud reconstructor.

Reference: /root/reference/model_zoo/image_reconstruction/reconstructor.py —
ResNet50 trunk -> 2048-d -> mapping -> z; AdaIN decoder over a sphere-noise
cloud [B, P, 3]; final 1x1 conv + sigmoid (outputs in [0, 1]).
"""

import flax.linen as nn

from cloud_transformers_tpu.models import register
from cloud_transformers_tpu.models.inpainter import AdaInDecoder
from cloud_transformers_tpu.nn.init import torch_kernel_init, torch_bias_init
from cloud_transformers_tpu.nn.norm import AdaIn1d
from cloud_transformers_tpu.nn.resnet import ResNet50Features
from cloud_transformers_tpu.nn.precision import MXUDense


@register("image_reconstructor")
class Reconstructor(nn.Module):
    """``__call__(noise [B,P,3], image [B,H,W,3])`` -> ([B,P,3], stats)."""

    num_latent: int = 512
    model_dim: int = 512

    remat_policy: str = "point_io"  # see MHCTTrunk.remat_policy

    @nn.compact
    def __call__(self, noise, image, train=True):
        z = ResNet50Features(name="res50")(image, train=train)
        z = nn.relu(MXUDense(self.num_latent, kernel_init=torch_kernel_init(),
                             bias_init=torch_bias_init(2048),
                             name="mapping")(z))

        x = MXUDense(self.model_dim, use_bias=False,
                     kernel_init=torch_kernel_init(), name="start_conv")(noise)
        x = nn.relu(AdaIn1d(self.model_dim, name="start_adain")(x, z))

        x, stats = AdaInDecoder(model_dim=self.model_dim,
                                remat_policy=self.remat_policy,
                                name="decoder")(
            x, z, noise, train=train)

        x = MXUDense(self.model_dim, use_bias=False,
                     kernel_init=torch_kernel_init(), name="final_conv1")(x)
        x = nn.relu(AdaIn1d(self.model_dim, name="final_adain")(x, z))
        out = MXUDense(3, kernel_init=torch_kernel_init(),
                       bias_init=torch_bias_init(self.model_dim),
                       name="final_conv2")(x)
        return nn.sigmoid(out), stats
