"""Training layer: the TPU-native counterpart of the reference's train.py
epoch loop (SURVEY.md §2 #12, §3.1), with the engineering the reference
lacks: sharding-aware orbax checkpoints, structured metrics, jitted eval."""

from ganet_tpu.train.loss import deep_supervision_loss, smooth_l1_loss
from ganet_tpu.train.metrics import disparity_metrics
from ganet_tpu.train.state import TrainState, create_train_state
from ganet_tpu.train.trainer import Trainer

__all__ = [
    "deep_supervision_loss",
    "smooth_l1_loss",
    "disparity_metrics",
    "TrainState",
    "create_train_state",
    "Trainer",
]
