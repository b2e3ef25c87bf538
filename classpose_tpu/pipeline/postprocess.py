"""Per-tile post-processing: instance masks → cell polygon features.

Host-side equivalent of the reference ``PostProcessor``
(predict_wsi.py:509-656): for each instance, crop its bbox
(scipy.ndimage.find_objects), extract the outer contour (cv2, RETR_EXTERNAL
— which implicitly fills holes for export), shift to tile coordinates,
scale to level-0 slide coordinates, validate the polygon (self-intersecting
contours are dropped — QuPath cannot read them), read the class from the
first in-mask class pixel, and emit the minimal feature dict
{id, coords, class_int, label, color, area, perimeter, centroid}.

This is on the pipeline's critical host path (~1k cells/tile at real
load), so the geometry work is batched: all contours are collected
first, then ONE native ``rings_batch`` call computes every ring's
area/centroid/perimeter/simplicity (the per-cell ctypes round trips of
the naive formulation were the largest host cost), and cell ids come
from one bulk ``os.urandom`` draw formatted as RFC-4122 v4 UUIDs.
"""

from __future__ import annotations

import os

import cv2
import numpy as np
from scipy import ndimage

from classpose_tpu.geometry.polygons import (
    rings_batch_metrics,
    rings_batch_metrics_packed,
)
from classpose_tpu.log import get_logger

logger = get_logger(__name__)


def get_colormap() -> list[list[int]]:
    """Set3 categorical palette ×255 (reference predict_wsi.py:99)."""
    from matplotlib import colormaps

    return [[int(y * 255) for y in x] for x in colormaps["Set3"].colors]


DEFAULT_CELL_COLOR = [0, 168, 132]


def _uuid4_batch(m: int) -> list[str]:
    """``m`` canonical RFC-4122 version-4 UUID strings from one urandom
    draw — same entropy source and format as ``uuid.uuid4()`` without
    its ~20 µs/call object machinery."""
    raw = bytearray(os.urandom(16 * m))
    out = []
    for i in range(m):
        o = 16 * i
        raw[o + 6] = (raw[o + 6] & 0x0F) | 0x40  # version 4
        raw[o + 8] = (raw[o + 8] & 0x3F) | 0x80  # RFC 4122 variant
        h = bytes(raw[o : o + 16]).hex()
        out.append(
            f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:]}"
        )
    return out


def _contours_batch_native(masks: np.ndarray):
    """All instances' outer contours in ONE native pass over the label
    image (geomfast ``contours_batch`` — Suzuki-Abe border following with
    OpenCV's exact step order and CHAIN_APPROX_SIMPLE compression).

    Returns (pts int32 (N, 2) x/y in tile coords, offs int64 (m+1,),
    ids int32 (m,), first_px int64 (m,)) or ``None`` when the native
    library is unavailable. Contour k is ``pts[offs[k]:offs[k+1]]`` for
    ascending instance id ``ids[k]``; ``first_px`` is the instance's
    raster-first flat pixel (the reference's class-lookup pixel).

    Parity with the cv2 per-instance loop is vertex-exact, including
    disconnected instances (cv2 returns EXTERNAL contours in reverse
    discovery order, so contours[0] is the raster-LAST component — the
    native pass replicates that; pinned by
    tests/test_native_contours.py)."""
    from classpose_tpu.native import load_geomfast

    lib = load_geomfast()
    if lib is None or not hasattr(lib, "contours_batch"):
        return None
    import ctypes

    m = np.ascontiguousarray(masks, np.int32)
    nmax = int(m.max()) if m.size else 0
    if nmax <= 0:
        return (
            np.zeros((0, 2), np.int32), np.zeros(1, np.int64),
            np.zeros(0, np.int32), np.zeros(0, np.int64),
        )
    H, W = m.shape
    cap = max(4096, H * W // 8)
    while True:
        pts = np.empty((cap, 2), np.int32)
        offs = np.zeros(nmax + 2, np.int64)
        ids = np.empty(nmax + 1, np.int32)
        fpx = np.empty(nmax + 1, np.int64)
        n = lib.contours_batch(
            m.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), H, W, cap,
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            fpx.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        )
        if n >= 0:
            return pts, offs[: n + 1], ids[:n], fpx[:n]
        cap *= 2


def process_tile(
    masks: np.ndarray,
    class_masks: np.ndarray | None,
    tile_origin: tuple[float, float],
    prediction_to_slide_scale: float,
    labels: list[str] | None = None,
    colormap: list[list[int]] | None = None,
) -> tuple[list[dict], int]:
    """Extract cell features from one tile's instance (+class) masks.

    ``tile_origin`` is the (x, y) level-0 coordinate of the tile.
    Returns (cells, n_invalid).
    """
    if colormap is None and labels is not None:
        colormap = get_colormap()
    n_invalid = 0
    ox, oy = tile_origin
    origin = np.array([ox, oy], np.float64)

    nat = _contours_batch_native(masks)
    if nat is not None:
        # native path: one image pass for every contour; vertices scaled
        # to slide coordinates in one vectorized op, metrics computed on
        # the packed buffer directly (no per-ring list/concat), validity
        # fully vectorized — only the feature-dict loop stays Python
        pts, offs, inst_ids, fpx = nat
        xy = (
            pts[: offs[-1]].astype(np.float64)
            * prediction_to_slide_scale + origin
        )
        if class_masks is not None and labels is not None:
            cls_all = np.ascontiguousarray(class_masks).ravel()[fpx]
        else:
            cls_all = None
        met = rings_batch_metrics_packed(xy, offs)
        valid = (
            (np.diff(offs) >= 4)
            & (met[:, 4] > 0)
            & (np.abs(met[:, 0]) >= 1e-12)
        )
        kept = np.flatnonzero(valid)
        n_invalid = int(len(inst_ids) - len(kept))
        uuids = _uuid4_batch(len(kept))

        cells = []
        for j, k in enumerate(kept):
            if cls_all is not None:
                cl_idx = max(int(cls_all[k]) - 1, 0)
                label = (
                    labels[cl_idx] if cl_idx < len(labels) else str(cl_idx)
                )
                color = colormap[cl_idx % len(colormap)]
            else:
                label = "cell"
                color = DEFAULT_CELL_COLOR
                cl_idx = 0
            coords = xy[offs[k] : offs[k + 1]].tolist()
            coords.append(list(coords[0]))
            cells.append(
                {
                    "id": uuids[j],
                    "coords": coords,
                    "class_int": cl_idx,
                    "area": abs(float(met[k, 0])),
                    "label": label,
                    "color": color,
                    "perimeter": float(met[k, 3]),
                    "centroid": [
                        round(float(met[k, 1]), 2),
                        round(float(met[k, 2]), 2),
                    ],
                }
            )
        return cells, n_invalid

    # fallback: the reference's per-instance bbox-crop cv2 loop
    # (identical output; pins the native path in tests)
    rings: list[np.ndarray] = []
    cell_classes: list[int] = []
    object_slices = ndimage.find_objects(masks)
    for label_idx, sl in enumerate(object_slices, start=1):
        if sl is None:
            continue
        y_slice, x_slice = sl
        cell_mask = masks[y_slice, x_slice] == label_idx
        contours = cv2.findContours(
            cell_mask.astype(np.uint8),
            cv2.RETR_EXTERNAL,
            cv2.CHAIN_APPROX_SIMPLE,
        )[0]
        if len(contours) == 0:
            n_invalid += 1
            continue
        curr = contours[0][:, 0].astype(np.float64) + np.array(
            [x_slice.start, y_slice.start], np.float64
        )
        curr = curr * prediction_to_slide_scale + origin
        if curr.shape[0] < 4:
            n_invalid += 1
            continue
        if class_masks is not None and labels is not None:
            flat = int(np.argmax(cell_mask))  # first in-mask pixel
            cl = int(
                class_masks[y_slice, x_slice].ravel()[flat]
            )
        else:
            cl = 0
        rings.append(curr)
        cell_classes.append(cl)

    # pass 2: one geometry call for every ring. cv2 contours are open
    # (no repeated closing vertex), matching rings_batch's convention.
    met = rings_batch_metrics(rings)
    valid = (met[:, 4] > 0) & (np.abs(met[:, 0]) >= 1e-12)
    n_valid = int(valid.sum())
    n_invalid += len(rings) - n_valid
    ids = _uuid4_batch(n_valid)

    cells: list[dict] = []
    j = 0
    for k, curr in enumerate(rings):
        if not valid[k]:
            continue
        if class_masks is not None and labels is not None:
            cl_idx = max(cell_classes[k] - 1, 0)
            label = labels[cl_idx] if cl_idx < len(labels) else str(cl_idx)
            color = colormap[cl_idx % len(colormap)]
            class_int = cl_idx
        else:
            label = "cell"
            color = DEFAULT_CELL_COLOR
            class_int = 0
        coords = curr.tolist()
        coords.append(list(coords[0]))
        cells.append(
            {
                "id": ids[j],
                "coords": coords,
                "class_int": class_int,
                "area": abs(float(met[k, 0])),
                "label": label,
                "color": color,
                "perimeter": float(met[k, 3]),
                "centroid": [
                    round(float(met[k, 1]), 2),
                    round(float(met[k, 2]), 2),
                ],
            }
        )
        j += 1
    return cells, n_invalid
