"""GrandQC tests: UNet++ architecture shapes, patch grid, tissue/artefact
pipelines with oracle predictors on a synthetic slide, and integration with
the WSI pipeline's filtering."""

import numpy as np
import jax
import pytest

from classpose_tpu.grandqc import detect_artefacts_wsi, detect_tissue_wsi
from classpose_tpu.grandqc.helpers import (
    contours_with_holes,
    iter_patches,
    predict_mask,
    simulate_jpeg_compression,
)
from classpose_tpu.io.array_reader import ArraySlide


def make_slide_with_tissue(W=4096, H=3072, mpp=0.25):
    """Slide: white background, one big pink tissue blob, one dark artefact
    inside it."""
    img = np.full((H, W, 3), 245, np.uint8)
    yy, xx = np.mgrid[:H, :W]
    tissue = ((yy - H / 2) ** 2 / (H / 3) ** 2
              + (xx - W / 2) ** 2 / (W / 3) ** 2) <= 1
    img[tissue] = [225, 180, 210]
    artefact = ((yy - H / 2) ** 2 + (xx - W / 2) ** 2) <= (H / 10) ** 2
    img[artefact] = [40, 40, 40]
    return ArraySlide(img, mpp=mpp), tissue, artefact


def tissue_oracle(batch):
    """Predict tissue where the patch is pinkish/dark (non-white)."""
    gray = batch.mean(-1)
    return (gray < 238).astype(np.int32)


def artefact_oracle(batch):
    """Predict artefact class 3 (darkspot) where very dark, else 1."""
    gray = batch.mean(-1)
    out = np.ones(gray.shape, np.int32)
    out[gray < 100] = 3
    return out


def test_unetpp_shapes():
    from classpose_tpu.grandqc.nets import UnetPlusPlus, UnetPlusPlusConfig
    from classpose_tpu.grandqc.nets import B0_OUT_CHANNELS

    cfg = UnetPlusPlusConfig(classes=2, decoder_channels=(16, 12, 8, 6, 4))
    net = UnetPlusPlus(cfg)
    x = np.zeros((1, 3, 64, 64), np.float32)
    params = net.init(jax.random.PRNGKey(0), x)
    y = net.apply(params, x)
    assert y.shape == (1, 2, 64, 64)
    # encoder feature channels match the smp-documented pyramid
    from classpose_tpu.grandqc.nets import EfficientNetB0Encoder
    enc = EfficientNetB0Encoder()
    ep = enc.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3),
                                                  np.float32))
    feats = enc.apply(ep, np.zeros((1, 64, 64, 3), np.float32))
    assert tuple(f.shape[-1] for f in feats) == B0_OUT_CHANNELS
    assert [f.shape[1] for f in feats] == [64, 32, 16, 8, 4, 2]


def test_iter_patches_covers_image():
    img = np.zeros((700, 1100, 3), np.uint8)
    seen = np.zeros((700, 1100), bool)
    for y, x, p in iter_patches(img, 512):
        assert p.shape[:2] == (512, 512)
        seen[y : y + 512, x : x + 512] = True
    assert seen.all()


def test_predict_mask_roundtrip():
    img = np.zeros((600, 900, 3), np.uint8)
    img[100:400, 200:700] = 255

    def fn(batch):
        return (batch.mean(-1) > 128).astype(np.int32)

    m = predict_mask(img, fn)
    assert m.shape == (600, 900)
    assert m[250, 400] == 1 and m[50, 50] == 0


def test_jpeg_sim():
    img = np.random.default_rng(0).integers(
        0, 255, (128, 128, 3), np.uint8
    ).astype(np.uint8)
    out = simulate_jpeg_compression(img)
    assert out.shape == img.shape
    assert not np.array_equal(out, img)  # lossy


def test_contours_with_holes():
    m = np.zeros((64, 64), np.uint8)
    m[8:56, 8:56] = 1
    m[24:40, 24:40] = 0  # hole
    cl = contours_with_holes(m)
    assert len(cl) == 1
    ext, holes = cl[0]
    assert len(holes) == 1


def test_detect_tissue_wsi_oracle():
    slide, tissue_gt, _ = make_slide_with_tissue()
    res = detect_tissue_wsi(slide, predict_fn=tissue_oracle, min_area=100.0)
    assert res["mask"].any()
    assert len(res["polygons"]) >= 1
    # biggest polygon's level-0 area ≈ GT tissue area (within 20%)
    areas = sorted(p.area for p in res["polygons"])
    assert areas[-1] == pytest.approx(tissue_gt.sum(), rel=0.2)
    feats = res["geojson"]["features"]
    assert feats[0]["properties"]["classification"]["name"] == "Tissue"
    # level-0 coordinates: polygon bbox within slide bounds
    x0, y0, x1, y1 = res["polygons"][0].bounds
    assert 0 <= x0 < x1 <= 4096 and 0 <= y0 < y1 <= 3072


def test_detect_artefacts_wsi_oracle():
    slide, _, artefact_gt = make_slide_with_tissue()
    res = detect_artefacts_wsi(
        slide,
        predict_fn=artefact_oracle,
        tissue_predict_fn=tissue_oracle,
    )
    assert 3 in res["contours"] and len(res["contours"][3]) >= 1
    assert len(res["polygons_level0"]) >= 1
    # detected artefact area ≈ GT dark disc
    total = sum(p.area for p in res["polygons_level0"])
    assert total == pytest.approx(artefact_gt.sum(), rel=0.3)
    names = {
        f["properties"]["classification"]["name"]
        for f in res["geojson"]["features"]
    }
    assert "Darkspot & Foreign Object" in names
    # non-tissue region is class 7
    assert res["mask"][0, 0] == 7


def test_no_tissue_slide():
    img = np.full((2048, 2048, 3), 250, np.uint8)
    res = detect_tissue_wsi(ArraySlide(img, mpp=0.25),
                            predict_fn=tissue_oracle)
    assert not res["mask"].any()
    assert res["polygons"] == []
