"""Distribution of IoU between GT instances and their bounding boxes.

Equivalent of
/root/reference/paper_experiments/scripts/iou_between_gt_and_squares.py
(the paper's evidence that square patch annotations are a poor instance
proxy) — vectorized per image instead of pooling a per-instance loop
across 8 processes.
"""

from __future__ import annotations

import argparse

import numpy as np

from dataset_tools import instance_bbox_ious


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Compute IoU between ground truth and squares."
    )
    parser.add_argument(
        "--gt_path", type=str, required=True,
        help="Path to (N, H, W, C) ground-truth masks (instance ch 0).",
    )
    args = parser.parse_args(argv)

    gt = np.load(args.gt_path, allow_pickle=True)
    dist = np.concatenate([
        instance_bbox_ious(np.asarray(m)[..., 0]) for m in gt
    ])
    for q in [0.0, 0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]:
        print(f"Quantile ({q}): {np.percentile(dist, q * 100)}")
    print(f"Mean: {np.mean(dist)}")
    return dist


if __name__ == "__main__":
    main()
