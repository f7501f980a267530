from cloud_transformers_tpu.losses.chamfer import (
    chamfer_distance,
    loss_chamfer,
    loss_chamfer_adj,
    loss_chamfer_2d,
)
from cloud_transformers_tpu.losses.emd import emd_auction, loss_emd
from cloud_transformers_tpu.losses.fscore import f_score, f_score_from_dists

__all__ = [
    "chamfer_distance",
    "loss_chamfer",
    "loss_chamfer_adj",
    "loss_chamfer_2d",
    "emd_auction",
    "loss_emd",
    "f_score",
    "f_score_from_dists",
]
