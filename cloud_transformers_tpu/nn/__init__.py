from cloud_transformers_tpu.nn.norm import AdaIn1d, instance_norm_1d
from cloud_transformers_tpu.nn.transforms import VolTransformer, PlaneTransformer
from cloud_transformers_tpu.nn.multihead import MultiHead, MultiHeadUnion, MultiHeadPool
from cloud_transformers_tpu.nn.multihead_adain import MultiHeadAdaIn, MultiHeadUnionAdaIn
from cloud_transformers_tpu.nn.grouped_conv import GroupedConv
from cloud_transformers_tpu.nn.conv_blocks import (
    Basic2DBlock,
    Basic3DBlock,
    Res2DBlock,
    Res3DBlock,
    Pool3DBlock,
    Upsample3DBlock,
    V2VModel,
)
from cloud_transformers_tpu.nn.unet2d import DoubleConv, Down, Up, OutConv, GroupCat, UNet

__all__ = [
    "AdaIn1d",
    "instance_norm_1d",
    "VolTransformer",
    "PlaneTransformer",
    "MultiHead",
    "MultiHeadUnion",
    "MultiHeadPool",
    "MultiHeadAdaIn",
    "MultiHeadUnionAdaIn",
    "GroupedConv",
    "Basic2DBlock",
    "Basic3DBlock",
    "Res2DBlock",
    "Res3DBlock",
    "Pool3DBlock",
    "Upsample3DBlock",
    "V2VModel",
    "DoubleConv",
    "Down",
    "Up",
    "OutConv",
    "GroupCat",
    "UNet",
]
