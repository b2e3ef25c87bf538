"""3D support tests: plane stitching, 3D recovery from GT-derived flows,
and run_3D plane aggregation."""

import numpy as np
import pytest

from classpose_tpu.runner.run3d import (
    compute_masks_3d,
    run_3D,
    stitch3D,
)


def test_stitch3d_links_planes():
    m = np.zeros((3, 32, 32), np.int32)
    # one cell persists across planes; a second appears in plane 2
    for z in range(3):
        m[z, 5:15, 5:15] = 1
    m[2, 20:28, 20:28] = 2
    out = stitch3D(m, stitch_threshold=0.25)
    # persistent cell keeps one id across planes
    assert out[0, 10, 10] == out[1, 10, 10] == out[2, 10, 10]
    assert out[2, 24, 24] not in (0, out[2, 10, 10])


def test_stitch3d_splits_on_low_iou():
    m = np.zeros((2, 32, 32), np.int32)
    m[0, 0:8, 0:8] = 1
    m[1, 20:28, 20:28] = 1  # moved far — IoU 0
    out = stitch3D(m, stitch_threshold=0.25)
    assert out[0, 4, 4] != out[1, 24, 24]


def test_compute_masks_3d_sphere():
    Lz = Ly = Lx = 48
    gt = np.zeros((Lz, Ly, Lx), np.int32)
    zz, yy, xx = np.mgrid[:Lz, :Ly, :Lx]
    gt[(zz - 16) ** 2 + (yy - 16) ** 2 + (xx - 16) ** 2 <= 81] = 1
    gt[(zz - 34) ** 2 + (yy - 34) ** 2 + (xx - 34) ** 2 <= 81] = 2
    # synthetic flows pointing at the centers
    dP = np.zeros((3, Lz, Ly, Lx), np.float32)
    for i, c in [(1, (16, 16, 16)), (2, (34, 34, 34))]:
        m = gt == i
        for a, ca in enumerate(c):
            d = ca - np.mgrid[:Lz, :Ly, :Lx][a]
            dP[a][m] = d[m]
    norm = np.sqrt((dP**2).sum(0))
    dP = np.where(norm > 0, dP / np.maximum(norm, 1e-6), 0.0) * 5.0
    cellprob = np.where(gt > 0, 6.0, -6.0).astype(np.float32)
    pred = compute_masks_3d(dP, cellprob, niter=40)
    assert pred.shape == gt.shape
    n = len(np.unique(pred)) - 1
    assert n == 2
    # both GT centers covered
    assert pred[16, 16, 16] > 0 and pred[34, 34, 34] > 0
    assert pred[16, 16, 16] != pred[34, 34, 34]


def test_run_3d_aggregates_planes():
    from classpose_tpu.nn import ClassTransformerConfig
    from classpose_tpu.runner import ClassposeModel

    cfg = ClassTransformerConfig(
        n_cell_classes=3, embed_dim=32, depth=1, num_heads=2, neck_dim=16,
        bsize=64,
    )
    model = ClassposeModel(cfg=cfg, precision="fp32")
    imgs = np.random.default_rng(0).uniform(
        size=(6, 64, 64, 3)
    ).astype(np.float32)
    yf, y_classf, styles = run_3D(
        model._apply, imgs, n_cell_classes=3, bsize=64, batch_size=4
    )
    assert yf.shape == (6, 64, 64, 4)
    assert y_classf.shape == (6, 64, 64, 3)
    assert np.isfinite(yf).all()


def test_eval_do_3d_and_stitch_paths():
    from classpose_tpu.nn import ClassTransformerConfig
    from classpose_tpu.runner import ClassposeModel

    cfg = ClassTransformerConfig(
        n_cell_classes=3, embed_dim=32, depth=1, num_heads=2, neck_dim=16,
        bsize=64,
    )
    model = ClassposeModel(cfg=cfg, precision="fp32")
    stack = np.random.default_rng(1).uniform(
        0, 255, size=(4, 64, 64, 3)
    ).astype(np.float32)
    masks3d, flows, cm, _ = model.eval(
        stack, do_3D=True, niter=10, min_size=1, bsize=64
    )
    assert masks3d.shape == (4, 64, 64)
    assert flows[1].shape == (3, 4, 64, 64)  # 3D flow components
    masks_st, *_ = model.eval(
        stack, stitch_threshold=0.25, niter=10, min_size=1, bsize=64
    )
    assert masks_st.shape == (4, 64, 64)
