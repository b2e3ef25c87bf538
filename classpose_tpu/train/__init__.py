"""Training stack: losses, uncertainty aggregation, datasets, samplers,
augmentations, the training loop, and checkpoint/resume."""

from classpose_tpu.train.losses import (
    loss_fn_seg,
    loss_fn_class,
    loss_fn_tversky,
    aggregate_losses,
    init_log_var,
)
from classpose_tpu.train.train import train_class_seg, make_train_step

__all__ = [
    "loss_fn_seg",
    "loss_fn_class",
    "loss_fn_tversky",
    "aggregate_losses",
    "init_log_var",
    "train_class_seg",
    "make_train_step",
]
