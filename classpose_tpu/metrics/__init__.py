"""Evaluation metrics: Panoptic Quality (binary + CoNIC multiclass),
detection P/R/F1, border-instance removal, sparse-GT fairness filtering."""

from classpose_tpu.metrics.stats_utils import (
    get_pq,
    get_multi_pq_info,
    get_multi_r2,
)
from classpose_tpu.metrics.pq import (
    compute_binary_pq_metrics,
    compute_multiclass_pq_metrics,
    remove_border_instances,
)
from classpose_tpu.metrics.utils import (
    remap_label,
    get_bounding_box,
    filter_out_unlabelled_cells,
)

__all__ = [
    "get_pq",
    "get_multi_pq_info",
    "get_multi_r2",
    "compute_binary_pq_metrics",
    "compute_multiclass_pq_metrics",
    "remove_border_instances",
    "remap_label",
    "get_bounding_box",
    "filter_out_unlabelled_cells",
]
