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

from classpose_tpu.geometry.polygons import rings_batch_metrics
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
    object_slices = ndimage.find_objects(masks)
    n_invalid = 0
    ox, oy = tile_origin
    origin = np.array([ox, oy], np.float64)

    # pass 1: contours in slide coordinates + per-cell class value
    rings: list[np.ndarray] = []
    cell_classes: list[int] = []
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
