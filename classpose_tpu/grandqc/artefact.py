"""GrandQC artefact detection over a whole slide.

Parity target: reference grandqc/wsi_artefact_detection.py:56-348 — tissue
detection first, thumbnail at MPP 1.0, per-512²-patch inference *only where
≥50 tissue pixels*, 7-class artefact mask (classes 2–6 = fold / darkspot /
pen / edge / out-of-focus; non-tissue forced to 7), per-class contour+hole
extraction with a 10-px min-area filter, colored class map, and level-0
GeoJSON.
"""

from __future__ import annotations

import cv2
import numpy as np

from classpose_tpu.geometry import Polygon
from classpose_tpu.grandqc.helpers import (
    ARTEFACT_CLASS_COLORS,
    ARTEFACT_CLASS_NAMES,
    contours_to_geojson_features,
    contours_with_holes,
    extract_slide_thumbnail,
    predict_mask,
    simulate_jpeg_compression,
)
from classpose_tpu.grandqc.tissue import detect_tissue_wsi, \
    make_unetpp_predict_fn
from classpose_tpu.log import get_logger

logger = get_logger(__name__)

MPP_ARTEFACT_MODEL = 1.0
MIN_TISSUE_PIXELS = 50
NON_TISSUE_CLASS = 7
MIN_CONTOUR_AREA_PX = 10


def detect_artefacts_wsi(
    slide_or_path,
    model_path: str | None = None,
    predict_fn=None,
    tissue_model_path: str | None = None,
    tissue_predict_fn=None,
    tissue_result: dict | None = None,
    mpp_model: float = MPP_ARTEFACT_MODEL,
    jpeg_quality: int = 80,
    n_classes: int = 8,
) -> dict:
    """Run artefact detection. Returns dict with keys:
    mask, colormap, contours (per class), polygons (thumb), polygons_level0,
    geojson, scale_to_level0, tissue (the tissue result used)."""
    from classpose_tpu import WSIReader

    slide = (
        WSIReader(slide_or_path)
        if isinstance(slide_or_path, str)
        else slide_or_path
    )
    if tissue_result is None:
        tissue_result = detect_tissue_wsi(
            slide,
            model_path=tissue_model_path,
            predict_fn=tissue_predict_fn,
        )

    thumb, scale, mpp = extract_slide_thumbnail(slide, mpp_model)
    thumb_sim = simulate_jpeg_compression(thumb, quality=jpeg_quality)

    # tissue mask upsampled from the MPP-10 grid to the MPP-1 grid
    tmask = tissue_result["mask"].astype(np.uint8)
    tmask = cv2.resize(
        tmask, (thumb.shape[1], thumb.shape[0]),
        interpolation=cv2.INTER_NEAREST,
    ).astype(bool)

    if predict_fn is None:
        if model_path is None:
            raise ValueError(
                "either model_path or predict_fn must be provided"
            )
        predict_fn = make_unetpp_predict_fn(model_path, classes=n_classes)

    def patch_filter(y, x, p):
        return tmask[y : y + p.shape[0], x : x + p.shape[1]].sum() >= \
            MIN_TISSUE_PIXELS

    mask = predict_mask(
        thumb_sim, predict_fn, patch_filter=patch_filter,
        fill_value=NON_TISSUE_CLASS,
    )
    mask[~tmask] = NON_TISSUE_CLASS

    colormap = np.zeros((*mask.shape, 3), np.uint8)
    contours: dict[int, list] = {}
    polygons_level0 = []
    features = []
    for cls, name in ARTEFACT_CLASS_NAMES.items():
        cls_mask = (mask == cls).astype(np.uint8)
        if cls_mask.sum() == 0:
            contours[cls] = []
            continue
        clist = contours_with_holes(
            cls_mask, min_area_px=MIN_CONTOUR_AREA_PX
        )
        contours[cls] = clist
        color = ARTEFACT_CLASS_COLORS[cls]
        colormap[mask == cls] = color
        polygons_level0.extend(
            Polygon(ext * scale, holes=[h * scale for h in holes])
            for ext, holes in clist
        )
        features.extend(
            contours_to_geojson_features(clist, scale, name, color=color)
        )

    logger.info(
        "Artefact detection: %d artefact regions across %d classes",
        len(polygons_level0),
        sum(1 for v in contours.values() if v),
    )
    return {
        "mask": mask,
        "colormap": colormap,
        "contours": contours,
        "polygons": polygons_level0,
        "polygons_level0": polygons_level0,
        "geojson": {"type": "FeatureCollection", "features": features},
        "scale_to_level0": scale,
        "tissue": tissue_result,
        "mpp": mpp,
    }
