"""Metrics tests: PQ on hand-built masks, border removal, sparse-GT
filtering, multiclass aggregation, and the CLI."""

import numpy as np
import pytest

from classpose_tpu.metrics import (
    compute_binary_pq_metrics,
    compute_multiclass_pq_metrics,
    filter_out_unlabelled_cells,
    get_pq,
    remap_label,
    remove_border_instances,
)
from classpose_tpu.metrics.utils import pairwise_iou_matrix


def test_remap_label():
    m = np.array([[0, 2], [6, 10]])
    out = remap_label(m)
    assert set(np.unique(out)) == {0, 1, 2, 3}
    assert out[0, 1] == 1 and out[1, 0] == 2 and out[1, 1] == 3


def test_pairwise_iou_matches_bruteforce():
    rng = np.random.default_rng(0)
    true = rng.integers(0, 4, (32, 32))
    pred = rng.integers(0, 5, (32, 32))
    M = pairwise_iou_matrix(true, pred)
    for t in range(1, 4):
        for p in range(1, 5):
            tm, pm = true == t, pred == p
            expect = (tm & pm).sum() / max((tm | pm).sum(), 1)
            assert M[t - 1, p - 1] == pytest.approx(expect)


def test_get_pq_perfect_match():
    m = np.zeros((20, 20), int)
    m[2:8, 2:8] = 1
    m[12:18, 12:18] = 2
    (dq, sq, pq), (tp, fp, fn), s = get_pq(m, m)
    assert tp == 2 and fp == 0 and fn == 0
    assert dq == pytest.approx(1.0, abs=1e-5)
    assert sq == pytest.approx(1.0, abs=1e-5)


def test_get_pq_partial_and_miss():
    gt = np.zeros((20, 20), int)
    gt[2:10, 2:10] = 1
    gt[12:18, 12:18] = 2
    pred = np.zeros((20, 20), int)
    pred[2:10, 2:10] = 1  # perfect match of 1
    pred[0:3, 15:19] = 2  # spurious
    (dq, sq, pq), (tp, fp, fn), s = get_pq(gt, pred)
    assert (tp, fp, fn) == (1, 1, 1)
    assert dq == pytest.approx(0.5, abs=1e-4)


def test_get_pq_munkres_low_threshold():
    gt = np.zeros((10, 10), int)
    gt[0:6, 0:6] = 1
    pred = np.zeros((10, 10), int)
    pred[3:9, 3:9] = 1  # IoU = 9/63 ≈ 0.14
    _, (tp, fp, fn), _ = get_pq(gt, pred, match_iou=0.5)
    assert tp == 0
    _, (tp2, _, _), _ = get_pq(gt, pred, match_iou=0.0)
    assert tp2 == 1  # Munkres pairing accepts any positive IoU


def test_remove_border_instances():
    m = np.zeros((10, 10), int)
    m[0:3, 0:3] = 1  # touches border
    m[5:8, 5:8] = 2
    out = remove_border_instances(m.copy())
    assert (out == 1).sum() == 0 and (out == 2).sum() == 9


def test_binary_pq_dataframe():
    m = np.zeros((2, 20, 20), int)
    m[0, 2:8, 2:8] = 1
    m[1, 5:15, 5:15] = 1
    df = compute_binary_pq_metrics(m, m.copy())
    assert len(df) == 2
    assert (df["f1"] == 1.0).all()
    assert set(df.columns) >= {
        "pq", "dq", "sq", "tp", "fp", "fn", "precision", "recall", "f1"
    }


def _mc_mask(cls_of_inst):
    m = np.zeros((40, 40, 2), int)
    pos = [(2, 2), (2, 22), (22, 2), (22, 22)]
    for i, ((y, x), c) in enumerate(zip(pos, cls_of_inst), start=1):
        m[y : y + 8, x : x + 8, 0] = i
        m[y : y + 8, x : x + 8, 1] = c
    return m


def test_multiclass_pq():
    gt = _mc_mask([1, 1, 2, 3])
    pred = _mc_mask([1, 1, 2, 2])  # one classification error
    global_df, per_image = compute_multiclass_pq_metrics(
        gt, pred, nr_classes=3
    )
    assert len(global_df) == 4  # 3 classes + avg
    c1 = global_df[global_df.class_id == 1].iloc[0]
    assert c1.tp == 2 and c1.fp == 0 and c1.fn == 0
    c3 = global_df[global_df.class_id == 3].iloc[0]
    assert c3.tp == 0 and c3.fn == 1
    c2 = global_df[global_df.class_id == 2].iloc[0]
    assert c2.tp == 1 and c2.fp == 1
    assert len(per_image) == 1


def test_filter_out_unlabelled_cells():
    gt = _mc_mask([1, 0, 2, 1])  # instance 2 unlabelled
    pred = _mc_mask([1, 2, 2, 1])
    gts, preds = filter_out_unlabelled_cells([gt.copy()], [pred.copy()])
    # unlabelled GT inst and its matched pred removed
    assert len(np.unique(gts[0][..., 0])) == 4  # 0 + 3 instances
    assert len(np.unique(preds[0][..., 0])) == 4


def test_metrics_cli(tmp_path):
    from classpose_tpu.entrypoints.calculate_metrics import main_with_args

    gt = np.stack([_mc_mask([1, 1, 2, 3])] * 2)
    pred = np.stack([_mc_mask([1, 1, 2, 3])] * 2)
    gt_p, pred_p = tmp_path / "gt.npy", tmp_path / "pred.npy"
    np.save(gt_p, gt)
    np.save(pred_p, pred)
    out = tmp_path / "metrics.csv"
    main_with_args(
        [
            "--gt_path", str(gt_p), "--pred_path", str(pred_p),
            "--output", str(out),
        ]
    )
    import pandas as pd

    df = pd.read_csv(out)
    assert (tmp_path / "metrics_per_image.csv").exists()
    avg = df[df.class_id == "avg"].iloc[0]
    assert float(avg.f1) == pytest.approx(1.0, abs=1e-4)
