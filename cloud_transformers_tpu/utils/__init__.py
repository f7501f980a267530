from cloud_transformers_tpu.utils.metrics import (
    confusion_matrix,
    iou_from_confusion,
    ConfusionAccumulator,
)

__all__ = ["confusion_matrix", "iou_from_confusion", "ConfusionAccumulator"]
