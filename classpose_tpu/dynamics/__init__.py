"""Flow-field dynamics: GT flow generation and instance-mask recovery.

This is the TPU answer to cellpose ``dynamics`` as used by the reference at
models.py:120-159 (``resize_and_compute_masks``) and train_utils.py:233-240
(``labels_to_flows``) — a vectorized XLA fixed-point loop instead of
per-pixel NumPy/CUDA."""

from classpose_tpu.dynamics.flows import (
    masks_to_flows,
    labels_to_flows,
    instance_centers,
)
from classpose_tpu.dynamics.masks import (
    compute_masks,
    follow_flows,
    get_masks_from_positions,
    get_masks_from_positions_batched,
    flow_errors,
    fill_holes_and_remove_small_masks,
)

__all__ = [
    "masks_to_flows",
    "labels_to_flows",
    "instance_centers",
    "compute_masks",
    "follow_flows",
    "get_masks_from_positions",
    "get_masks_from_positions_batched",
    "flow_errors",
    "fill_holes_and_remove_small_masks",
]
