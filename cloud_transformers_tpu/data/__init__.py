from cloud_transformers_tpu.data.loader import DataLoader
from cloud_transformers_tpu.data.scanobjectnn import ScanObjectNN
from cloud_transformers_tpu.data.s3dis import Indoor3DSemSeg
from cloud_transformers_tpu.data.completion import ShapeNetCompletion
from cloud_transformers_tpu.data.image_point import ImageToPoint

__all__ = [
    "DataLoader",
    "ScanObjectNN",
    "Indoor3DSemSeg",
    "ShapeNetCompletion",
    "ImageToPoint",
]
