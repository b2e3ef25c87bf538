"""GrandQC helpers: JPEG simulation, thumbnails, patch grids, contours.

Parity targets (reference grandqc/wsi_qc_helpers.py:7-146 and the shared
logic of wsi_tissue_detection.py / wsi_artefact_detection.py): the
JPEG-compression simulation that matches the QC models' training data, a
fixed-MPP thumbnail extractor, 512² patch grids with edge-overhang
re-cropping, connected-component area filtering in µm², and
contour-with-holes extraction (cv2 RETR_CCOMP) into contour dicts +
GeoJSON features in level-0 coordinates.
"""

from __future__ import annotations

import uuid

import cv2
import numpy as np

from classpose_tpu.log import get_logger
from classpose_tpu.utils import get_slide_resolution

logger = get_logger(__name__)

PATCH_SIZE = 512


def simulate_jpeg_compression(img: np.ndarray, quality: int = 80) -> np.ndarray:
    """Encode/decode through JPEG to match the QC models' training domain
    (reference wsi_qc_helpers.py:7-23)."""
    ok, enc = cv2.imencode(
        ".jpg", cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
        [int(cv2.IMWRITE_JPEG_QUALITY), quality],
    )
    if not ok:  # pragma: no cover
        return img
    return cv2.cvtColor(cv2.imdecode(enc, cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB)


def extract_slide_thumbnail(
    slide, mpp_target: float
) -> tuple[np.ndarray, float, tuple[float, float]]:
    """Read a whole-slide thumbnail at ``mpp_target`` µm/px.

    Returns (rgb, scale_to_level0, slide_mpp): multiply thumbnail coords by
    ``scale_to_level0`` to get level-0 coordinates."""
    mpp = get_slide_resolution(slide)
    if mpp is None:
        raise ValueError("slide has no resolvable MPP")
    downsample = mpp_target / mpp[0]
    W0, H0 = slide.level_dimensions[0]
    tw, th = max(1, int(W0 / downsample)), max(1, int(H0 / downsample))
    level = slide.get_best_level_for_downsample(downsample)
    lw, lh = slide.level_dimensions[level]
    region = slide.read_region((0, 0), level, (lw, lh))
    arr = np.asarray(region)[..., :3]
    thumb = cv2.resize(arr, (tw, th), interpolation=cv2.INTER_AREA)
    return thumb, downsample, mpp


def iter_patches(img: np.ndarray, patch: int = PATCH_SIZE):
    """Yield (y, x, patch) over a grid with edge-overhang re-cropping from
    the image borders (reference wsi_tissue_detection.py:134-195): edge
    patches are shifted inward so every patch is exactly patch²."""
    H, W = img.shape[:2]
    ys = list(range(0, max(H - patch, 0) + 1, patch)) or [0]
    xs = list(range(0, max(W - patch, 0) + 1, patch)) or [0]
    if H > patch and ys[-1] + patch < H:
        ys.append(H - patch)
    if W > patch and xs[-1] + patch < W:
        xs.append(W - patch)
    for y in ys:
        for x in xs:
            yy, xx = min(y, max(H - patch, 0)), min(x, max(W - patch, 0))
            p = img[yy : yy + patch, xx : xx + patch]
            if p.shape[0] < patch or p.shape[1] < patch:
                canvas = np.full((patch, patch) + p.shape[2:], 255, p.dtype)
                canvas[: p.shape[0], : p.shape[1]] = p
                p = canvas
            yield yy, xx, p


def predict_mask(
    img: np.ndarray,
    predict_fn,
    patch: int = PATCH_SIZE,
    patch_filter=None,
    fill_value: int = 0,
    batch_size: int = 8,
) -> np.ndarray:
    """Tile ``img`` into patches, run ``predict_fn`` (batched, returns
    argmax class maps), reassemble. ``patch_filter(y, x, patch) -> bool``
    can skip patches (artefact model: <50 tissue pixels)."""
    H, W = img.shape[:2]
    out = np.full((H, W), fill_value, np.int32)
    batch, coords = [], []

    def flush():
        if not batch:
            return
        preds = predict_fn(np.stack(batch))
        for (y, x), pm in zip(coords, preds):
            h = min(patch, H - y)
            w = min(patch, W - x)
            out[y : y + h, x : x + w] = pm[:h, :w]
        batch.clear()
        coords.clear()

    for y, x, p in iter_patches(img, patch):
        if patch_filter is not None and not patch_filter(y, x, p):
            continue
        batch.append(p)
        coords.append((y, x))
        if len(batch) >= batch_size:
            flush()
    flush()
    return out


def filter_components_by_area(
    mask: np.ndarray, min_area_um2: float, mpp: float
) -> np.ndarray:
    """Remove connected components below ``min_area_um2`` (reference
    wsi_tissue_detection.py:204-217)."""
    if min_area_um2 <= 0:
        return mask.astype(np.uint8)
    n, labels = cv2.connectedComponents(mask.astype(np.uint8))
    min_px = min_area_um2 / (mpp * mpp)
    counts = np.bincount(labels.ravel(), minlength=n)
    keep = counts >= min_px
    keep[0] = False
    return keep[labels].astype(np.uint8)


def contours_with_holes(
    mask: np.ndarray, min_area_px: float = 0.0
) -> list[tuple[np.ndarray, list[np.ndarray]]]:
    """cv2 RETR_CCOMP contour extraction: [(exterior, [holes...])], both as
    (N, 2) arrays (reference wsi_tissue_detection.py:219-259)."""
    contours, hierarchy = cv2.findContours(
        mask.astype(np.uint8), cv2.RETR_CCOMP, cv2.CHAIN_APPROX_SIMPLE
    )
    out = []
    if hierarchy is None:
        return out
    hierarchy = hierarchy[0]
    for i, cnt in enumerate(contours):
        if hierarchy[i][3] != -1:  # is a hole
            continue
        if cv2.contourArea(cnt) < min_area_px or len(cnt) < 3:
            continue
        holes = []
        child = hierarchy[i][2]
        while child != -1:
            hc = contours[child]
            if len(hc) >= 3:
                holes.append(hc[:, 0].astype(np.float64))
            child = hierarchy[child][0]
        out.append((cnt[:, 0].astype(np.float64), holes))
    return out


def contours_to_geojson_features(
    contour_list,
    scale_to_level0: float,
    class_name: str,
    color=None,
) -> list[dict]:
    """Contour dicts → GeoJSON Polygon features in level-0 coordinates
    (reference wsi_qc_helpers.py GeoJSON feature builder)."""
    feats = []
    for exterior, holes in contour_list:
        rings = []
        for ring in [exterior, *holes]:
            r = (ring * scale_to_level0).tolist()
            if r and r[0] != r[-1]:
                r.append(list(r[0]))
            rings.append(r)
        feats.append(
            {
                "type": "Feature",
                "id": str(uuid.uuid4()),
                "geometry": {"type": "Polygon", "coordinates": rings},
                "properties": {
                    "objectType": "annotation",
                    "isLocked": False,
                    "classification": {
                        "name": class_name,
                        "color": color or [0, 128, 0],
                    },
                },
            }
        )
    return feats


ARTEFACT_CLASS_NAMES = {
    2: "Fold",
    3: "Darkspot & Foreign Object",
    4: "Pen Marking",
    5: "Edge & Air Bubble",
    6: "Out of Focus",
}

ARTEFACT_CLASS_COLORS = {
    2: [255, 0, 0],
    3: [128, 0, 128],
    4: [0, 0, 255],
    5: [255, 165, 0],
    6: [0, 255, 255],
}
