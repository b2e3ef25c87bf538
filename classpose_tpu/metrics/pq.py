"""Dataset-level PQ metrics (binary + CoNIC multiclass).

Parity targets: reference metrics/pq.py — ``remove_border_instances``
(:65-92), ``compute_binary_pq_metrics`` (:95-156) and
``compute_multiclass_pq_metrics`` (:159-290) with dataset-level TP/FP/FN
aggregation and optional multiprocessing.
"""

from __future__ import annotations

from multiprocessing import Pool

import numpy as np
import pandas as pd

from classpose_tpu.metrics.stats_utils import get_multi_pq_info, get_pq
from classpose_tpu.metrics.utils import (
    check_and_coherce_if_necessary,
    filter_out_unlabelled_cells,
    remap_label,
)


def remove_border_instances(mask: np.ndarray) -> np.ndarray:
    """Zero out instances with any pixel on the image border."""
    instances = mask[..., 0] if mask.ndim == 3 else mask
    border = np.unique(
        np.concatenate(
            [instances[0], instances[:, 0], instances[-1], instances[:, -1]]
        )
    )
    border = border[border != 0]
    mask[np.isin(instances, border)] = 0
    return mask


def compute_binary_pq_metrics(
    gt_masks,
    pred_masks,
    match_iou: float = 0.5,
    no_border_instances: bool = False,
) -> pd.DataFrame:
    """Per-image binary PQ/DQ/SQ + detection P/R/F1."""
    gt_masks = check_and_coherce_if_necessary(gt_masks, 2)
    pred_masks = check_and_coherce_if_necessary(pred_masks, 2)
    results = []
    for i in range(len(gt_masks)):
        gt, pred = np.copy(gt_masks[i]), np.copy(pred_masks[i])
        if no_border_instances:
            gt = remove_border_instances(gt)
            pred = remove_border_instances(pred)
        gt, pred = remap_label(gt), remap_label(pred)
        (dq, sq, pq), (tp, fp, fn), iou_sum = get_pq(
            gt, pred, match_iou=match_iou
        )
        results.append(
            {
                "image_id": i,
                "pq": pq, "dq": dq, "sq": sq,
                "tp": tp, "fp": fp, "fn": fn,
                "precision": tp / (tp + fp) if tp + fp else 0.0,
                "recall": tp / (tp + fn) if tp + fn else 0.0,
                "f1": (2 * tp) / (2 * tp + fp + fn)
                if 2 * tp + fp + fn else 0.0,
                "iou_sum": iou_sum,
                "avg_iou": iou_sum / tp if tp > 0 else 0.0,
            }
        )
    return pd.DataFrame(results)


class MulticlassPQCalculator:
    """Picklable per-image worker (reference pq.py:33-58)."""

    def __init__(self, nr_classes, match_iou, no_border_instances):
        self.nr_classes = nr_classes
        self.match_iou = match_iou
        self.no_border_instances = no_border_instances

    def __call__(self, args):
        gt, pred, idx = args
        if self.no_border_instances:
            gt = remove_border_instances(np.copy(gt))
            pred = remove_border_instances(np.copy(pred))
        return (
            get_multi_pq_info(
                gt, pred, nr_classes=self.nr_classes,
                match_iou=self.match_iou,
            ),
            idx,
        )


def compute_multiclass_pq_metrics(
    gt_masks,
    pred_masks,
    match_iou: float = 0.5,
    nr_classes: int = 6,
    n_workers: int = 0,
    no_border_instances: bool = False,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """CoNIC-style dataset-level multiclass PQ. Returns (global_df,
    per_image_df)."""
    gt_masks = check_and_coherce_if_necessary(gt_masks, 3)
    pred_masks = check_and_coherce_if_necessary(pred_masks, 3)
    gt_masks = [np.copy(m) for m in gt_masks]
    pred_masks = [np.copy(m) for m in pred_masks]
    gt_masks, pred_masks = filter_out_unlabelled_cells(gt_masks, pred_masks)

    tp_c = np.zeros(nr_classes)
    fp_c = np.zeros(nr_classes)
    fn_c = np.zeros(nr_classes)
    iou_c = np.zeros(nr_classes)
    per_image = []

    calc = MulticlassPQCalculator(nr_classes, match_iou, no_border_instances)
    inputs = zip(gt_masks, pred_masks, range(len(gt_masks)))
    if n_workers < 2:
        mapped = map(calc, inputs)
    else:
        pool = Pool(n_workers)
        mapped = pool.imap_unordered(calc, inputs)

    for pq_info, i in mapped:
        row = {"image_id": i}
        for c in range(nr_classes):
            tp, fp, fn, iou_sum = pq_info[c]
            tp_c[c] += tp
            fp_c[c] += fp
            fn_c[c] += fn
            iou_c[c] += iou_sum
            row[f"class_{c+1}_tp"] = tp
            row[f"class_{c+1}_fp"] = fp
            row[f"class_{c+1}_fn"] = fn
            row[f"class_{c+1}_avg_iou"] = iou_sum / tp if tp > 0 else 0.0
        per_image.append(row)
    if n_workers >= 2:
        pool.close()
        pool.join()
    per_image = sorted(per_image, key=lambda r: r["image_id"])

    results = []
    for c in range(nr_classes):
        tp, fp, fn, iou_sum = tp_c[c], fp_c[c], fn_c[c], iou_c[c]
        dq = tp / ((tp + 0.5 * fp + 0.5 * fn) + 1.0e-6)
        sq = iou_sum / (tp + 1.0e-6)
        results.append(
            {
                "class_id": c + 1,
                "pq": dq * sq, "dq": dq, "sq": sq,
                "tp": tp, "fp": fp, "fn": fn,
                "precision": tp / (tp + fp) if tp + fp else 0.0,
                "recall": tp / (tp + fn) if tp + fn else 0.0,
                "f1": (2 * tp) / (2 * tp + fp + fn)
                if 2 * tp + fp + fn else 0.0,
                "iou_sum": iou_sum,
            }
        )
    avg = {
        "class_id": "avg",
        "pq": np.mean([r["pq"] for r in results]),
        "dq": np.mean([r["dq"] for r in results]),
        "sq": np.mean([r["sq"] for r in results]),
        "tp": np.sum([r["tp"] for r in results]),
        "fp": np.sum([r["fp"] for r in results]),
        "fn": np.sum([r["fn"] for r in results]),
        "precision": np.mean([r["precision"] for r in results]),
        "recall": np.mean([r["recall"] for r in results]),
        "f1": np.mean([r["f1"] for r in results]),
        "iou_sum": np.sum([r["iou_sum"] for r in results]),
    }
    results.append(avg)
    return pd.DataFrame(results), pd.DataFrame(per_image)
