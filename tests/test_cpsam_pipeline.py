"""Single-class (cpsam) pipeline variant test with an oracle model."""

import json

import numpy as np
import pytest

from classpose_tpu.entrypoints.predict_wsi_cpsam import build_parser, main
from classpose_tpu.io.array_reader import synthetic_wsi


class SingleClassOracle:
    nclasses = 1

    def eval(self, x, **kw):
        import cv2
        from scipy import ndimage

        img = np.asarray(x)
        if img.ndim == 3 and img.shape[-1] != 3:
            img = np.moveaxis(img, 0, -1)
        fg = (img.mean(-1) < 180).astype(np.uint8)
        fg = cv2.morphologyEx(fg, cv2.MORPH_OPEN, np.ones((3, 3), np.uint8))
        masks, _ = ndimage.label(fg)
        dP = np.zeros((2, *masks.shape), np.float32)
        cp = np.where(masks > 0, 6.0, -6.0).astype(np.float32)
        return masks, (None, dP, cp, None, img.shape), \
            np.zeros_like(masks), np.zeros(256)


def test_cpsam_pipeline(tmp_path, monkeypatch):
    monkeypatch.setenv("WSI_READER", "array")
    slide, gt = synthetic_wsi(width=2048, height=1024, n_cells=40, seed=5,
                              mpp=0.5)
    sp = tmp_path / "s.npy"
    np.save(sp, slide._level0)
    args = build_parser().parse_args(
        [
            "--model_path", "dummy.npz",
            "--train_mpp", "0.5",
            "--slide_path", str(sp),
            "--output_folder", str(tmp_path),
            "--tile_size", "1024",
            "--mpp", "0.5",
        ]
    )
    res = main(args, model_override=SingleClassOracle())
    assert res["n_cells"] == pytest.approx(len(gt), abs=0.15 * len(gt))
    fc = json.loads((tmp_path / "s_cell_contours.geojson").read_text())
    names = {
        f["properties"]["classification"]["name"] for f in fc["features"]
    }
    assert names == {"cell"}
    colors = {
        tuple(f["properties"]["classification"]["color"])
        for f in fc["features"]
    }
    assert colors == {(0, 168, 132)}
