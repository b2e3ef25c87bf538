"""Per-tile post-processing: instance masks → cell polygon features.

Host-side equivalent of the reference ``PostProcessor``
(predict_wsi.py:509-656): for each instance, crop its bbox
(scipy.ndimage.find_objects), extract the outer contour (cv2, RETR_EXTERNAL
— which implicitly fills holes for export), shift to tile coordinates,
scale to level-0 slide coordinates, validate the polygon (self-intersecting
contours are dropped — QuPath cannot read them), read the class from the
first in-mask class pixel, and emit the minimal feature dict
{id, coords, class_int, label, color, area, perimeter, centroid}.
"""

from __future__ import annotations

import uuid

import cv2
import numpy as np
from scipy import ndimage

from classpose_tpu.geometry.polygons import Polygon
from classpose_tpu.log import get_logger

logger = get_logger(__name__)


def get_colormap() -> list[list[int]]:
    """Set3 categorical palette ×255 (reference predict_wsi.py:99)."""
    from matplotlib import colormaps

    return [[int(y * 255) for y in x] for x in colormaps["Set3"].colors]


DEFAULT_CELL_COLOR = [0, 168, 132]


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
    cells: list[dict] = []
    n_invalid = 0
    ox, oy = tile_origin
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
        curr = curr * prediction_to_slide_scale + np.array([ox, oy])
        if curr.shape[0] < 4:
            n_invalid += 1
            continue
        poly = Polygon(curr)
        if not poly.is_valid:
            n_invalid += 1
            continue
        center = [round(c, 2) for c in poly.centroid]
        coords = curr.tolist()
        coords.append(list(coords[0]))

        if class_masks is not None and labels is not None:
            cl = int(class_masks[y_slice, x_slice][cell_mask][0])
            cl_idx = max(cl - 1, 0)
            label = labels[cl_idx] if cl_idx < len(labels) else str(cl_idx)
            color = colormap[cl_idx % len(colormap)]
            class_int = cl_idx
        else:
            label = "cell"
            color = DEFAULT_CELL_COLOR
            class_int = 0

        cells.append(
            {
                "id": str(uuid.uuid4()),
                "coords": coords,
                "class_int": class_int,
                "area": poly.area,
                "label": label,
                "color": color,
                "perimeter": poly.length,
                "centroid": center,
            }
        )
    return cells, n_invalid
