"""BASELINE config-3 shaped integration test: TTA + tissue detection +
artefact detection + --filter_artefacts, end-to-end with oracle models."""

import json

import numpy as np
import pytest

from classpose_tpu.io.array_reader import ArraySlide
from classpose_tpu.pipeline.predict_wsi import main
from tests.test_pipeline_integration import OracleModel


@pytest.fixture(autouse=True)
def _env(monkeypatch):
    monkeypatch.setenv("WSI_READER", "array")
    from classpose_tpu import model_configs

    monkeypatch.setattr(
        model_configs.ModelConfig, "download_if_necessary", lambda self: None
    )


def _make_slide_with_artefact(tmp_path):
    """Tissue-covered slide with synthetic nuclei; a pen-mark-dark artefact
    region in the left quarter containing some cells."""
    import cv2

    rng = np.random.default_rng(21)
    # note: the (reference-faithful) full-grid enumeration drops margins
    # beyond the last full tile, so keep the slide fully covered by the
    # 1024/64 grid and the cells inside the covered area
    H, W = 1024, 2048
    img = np.full((H, W, 3), 0, np.uint8)
    img[..., 0], img[..., 1], img[..., 2] = 228, 200, 220
    gt = []
    occupancy = np.zeros((H, W), bool)
    attempts = 0
    while len(gt) < 120 and attempts < 3000:
        attempts += 1
        r = int(rng.integers(9, 14))
        cx = int(rng.integers(r + 2, 1980 - r))
        cy = int(rng.integers(r + 2, H - r - 2))
        if occupancy[
            max(0, cy - r - 3) : cy + r + 3, max(0, cx - r - 3) : cx + r + 3
        ].any():
            continue
        cv2.circle(img, (cx, cy), r, (90, 60, 140), -1)
        occupancy[cy - r - 3 : cy + r + 3, cx - r - 3 : cx + r + 3] = True
        gt.append((cx, cy))
    # dark artefact blob top-left (visible at artefact-model MPP)
    img[100:500, 100:500] = [35, 35, 35]
    path = tmp_path / "qc.npy"
    np.save(path, img)
    return str(path), gt


def _tissue_fn(batch):
    return (batch.mean(-1) < 240).astype(np.int32)


def _artefact_fn(batch):
    out = np.ones(batch.shape[:-1], np.int32)
    # threshold below the nuclei intensity (~97) so only the dark blob
    # (35) is flagged
    out[batch.mean(-1) < 70] = 4  # pen marking
    return out


def test_full_qc_pipeline_with_artefact_filter(tmp_path, monkeypatch):
    slide_path, gt = _make_slide_with_artefact(tmp_path)

    # patch the model-path loaders to oracle predictors (artefact.py binds
    # the symbol at import time — patch both modules)
    import classpose_tpu.grandqc.artefact as artefact_mod
    import classpose_tpu.grandqc.tissue as tissue_mod

    fake = lambda path, classes: (  # noqa: E731
        _tissue_fn if classes == 2 else _artefact_fn
    )
    monkeypatch.setattr(tissue_mod, "make_unetpp_predict_fn", fake)
    monkeypatch.setattr(artefact_mod, "make_unetpp_predict_fn", fake)

    args = type("Args", (), dict(
        model_config="conic",
        slide_path=slide_path,
        output_folder=str(tmp_path),
        tile_size=1024, overlap=64, batch_size=4, precision="fp32",
        tta=True,
        roi_geojson=None, output_type=["csv"],
        tissue_detection_model_path="tissue.npz",
        artefact_detection_model_path="artefact.npz",
        filter_artefacts=True,
        roi_class_priority=None, min_area=0, mpp=0.5, device=None,
        inference_threads=2, tile_batch=2,
    ))()
    res = main(args, model_override=OracleModel())

    # artefact region cells removed; most others kept
    feats = res["features"]
    in_artefact = [
        (cx, cy) for cx, cy in gt if 100 <= cx <= 500 and 100 <= cy <= 500
    ]
    outside = len(gt) - len(in_artefact)
    assert res["n_cells"] <= outside + 3
    assert res["n_cells"] >= 0.75 * outside
    # no remaining cell centroid inside the artefact box
    from classpose_tpu.pipeline.outputs import get_cell_centroid

    for f in feats:
        cx, cy = get_cell_centroid(f)
        assert not (110 <= cx <= 490 and 110 <= cy <= 490), (cx, cy)

    # QC geojson outputs written
    assert (tmp_path / "qc_tissue_contours.geojson").exists()
    art = json.loads((tmp_path / "qc_artefact_contours.geojson").read_text())
    names = {
        f["properties"]["classification"]["name"] for f in art["features"]
    }
    assert "Pen Marking" in names
    # density CSV artefact-corrected
    import pandas as pd

    dens = pd.read_csv(tmp_path / "qc_cellular_densities.csv")
    assert dens["count"].sum() == res["n_cells"]


def test_roi_densities_artefact_corrected(tmp_path, monkeypatch):
    """ROI mode + artefact detection: the density denominator of the ROI
    class overlapped by the artefact shrinks; the other class is untouched
    (reference predict_wsi.py:1810-1824)."""
    slide_path, gt = _make_slide_with_artefact(tmp_path)

    import classpose_tpu.grandqc.artefact as artefact_mod
    import classpose_tpu.grandqc.tissue as tissue_mod

    def fake(model_path, classes=2, **kw):
        return _tissue_fn if classes == 2 else _artefact_fn

    monkeypatch.setattr(tissue_mod, "make_unetpp_predict_fn", fake)
    monkeypatch.setattr(artefact_mod, "make_unetpp_predict_fn", fake)

    def sq(x0, y0, x1, y1, name):
        return {
            "type": "Feature",
            "geometry": {
                "type": "Polygon",
                "coordinates": [[[x0, y0], [x1, y0], [x1, y1], [x0, y1],
                                 [x0, y0]]],
            },
            "properties": {"classification": {"name": name}},
        }

    # artefact blob lives at [100:500, 100:500] (slide coords); "Left"
    # covers it, "Right" does not
    roi = {"type": "FeatureCollection",
           "features": [sq(0, 0, 1000, 1000, "Left"),
                        sq(1100, 0, 2047, 1000, "Right")]}
    roi_path = tmp_path / "roi.geojson"
    roi_path.write_text(json.dumps(roi))

    args = type("Args", (), dict(
        model_config="conic",
        slide_path=slide_path,
        output_folder=str(tmp_path),
        tile_size=1024, overlap=64, batch_size=4, precision="fp32",
        tta=False,
        roi_geojson=str(roi_path), output_type=["csv"],
        tissue_detection_model_path="tissue.npz",
        artefact_detection_model_path="artefact.npz",
        filter_artefacts=False,
        roi_class_priority=None, min_area=0, mpp=0.5, device=None,
        inference_threads=2, tile_batch=2,
    ))()
    res = main(args, model_override=OracleModel())
    assert res["n_cells"] > 0

    import pandas as pd

    dens = pd.read_csv(tmp_path / "qc_cellular_densities.csv")
    assert set(dens["region"]) == {"Left", "Right"}
    # recompute expected: density = count / ((roi_area - artefact∩roi) mpp²/1e6)
    mpp = 0.5
    by = {r: g for r, g in dens.groupby("region")}
    left_counts = by["Left"]["count"].sum()
    art_area = 400 * 400  # approximate artefact blob area in slide px
    left_eff_mm2_corrected = (1000 * 1000 - art_area) * mpp * mpp / 1e6
    left_eff_mm2_raw = (1000 * 1000) * mpp * mpp / 1e6
    left_density = by["Left"]["density"].sum()
    # corrected density must exceed the uncorrected one when cells exist
    if left_counts > 0:
        assert left_density > left_counts / left_eff_mm2_raw * 1.05
        assert left_density == pytest.approx(
            left_counts / left_eff_mm2_corrected, rel=0.25
        )
    # Right ROI untouched by the artefact: density == count / roi area
    right_counts = by["Right"]["count"].sum()
    right_mm2 = (2047 - 1100) * 1000 * mpp * mpp / 1e6
    if right_counts > 0:
        assert by["Right"]["density"].sum() == pytest.approx(
            right_counts / right_mm2, rel=0.02
        )
