from cloud_transformers_tpu.train.config import load_config
from cloud_transformers_tpu.train.optim import make_optimizer
from cloud_transformers_tpu.train.state import TrainState, create_train_state
from cloud_transformers_tpu.train.checkpoint import CheckpointManager
from cloud_transformers_tpu.train.logging import MetricLogger

__all__ = [
    "load_config",
    "make_optimizer",
    "TrainState",
    "create_train_state",
    "CheckpointManager",
    "MetricLogger",
]
