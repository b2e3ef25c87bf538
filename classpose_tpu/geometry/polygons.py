"""Polygon primitives: shoelace metrics, containment, validity, repair.

Replaces the shapely usage of the reference pipeline
(PostProcessor validity check predict_wsi.py:625-640, make_valid repair
:1029-1083, ROI containment :1247-1333) without a GEOS dependency.
"""

from __future__ import annotations

import numpy as np


class Polygon:
    """A simple polygon with optional holes.

    ``exterior``: (N, 2) array of (x, y); closed or open rings accepted
    (a closing vertex equal to the first is dropped internally).
    """

    __slots__ = ("exterior", "holes", "_bounds")

    def __init__(self, exterior, holes=None):
        ext = np.asarray(exterior, np.float64)
        if len(ext) >= 2 and np.allclose(ext[0], ext[-1]):
            ext = ext[:-1]
        self.exterior = ext
        self.holes = [
            np.asarray(h, np.float64)[
                : -1 if len(h) >= 2 and np.allclose(h[0], h[-1]) else None
            ]
            for h in (holes or [])
        ]
        self._bounds = None

    # -------------------------------------------------------------- metrics
    @staticmethod
    def _ring_area(r: np.ndarray) -> float:
        x, y = r[:, 0], r[:, 1]
        return 0.5 * float(
            np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y)
        )

    @property
    def area(self) -> float:
        a = abs(self._ring_area(self.exterior))
        for h in self.holes:
            a -= abs(self._ring_area(h))
        return a

    @property
    def length(self) -> float:
        total = 0.0
        for r in [self.exterior, *self.holes]:
            d = np.diff(np.vstack([r, r[:1]]), axis=0)
            total += float(np.sqrt((d**2).sum(axis=1)).sum())
        return total

    @property
    def centroid(self) -> tuple[float, float]:
        r = self.exterior
        x, y = r[:, 0], r[:, 1]
        xn, yn = np.roll(x, -1), np.roll(y, -1)
        cross = x * yn - xn * y
        a = cross.sum() / 2.0
        if abs(a) < 1e-12:
            return float(x.mean()), float(y.mean())
        cx = ((x + xn) * cross).sum() / (6.0 * a)
        cy = ((y + yn) * cross).sum() / (6.0 * a)
        return float(cx), float(cy)

    @property
    def bounds(self) -> tuple[float, float, float, float]:
        if self._bounds is None:
            e = self.exterior
            self._bounds = (
                float(e[:, 0].min()),
                float(e[:, 1].min()),
                float(e[:, 0].max()),
                float(e[:, 1].max()),
            )
        return self._bounds

    # ---------------------------------------------------------- containment
    def contains_point(self, x: float, y: float) -> bool:
        if not _point_in_ring(self.exterior, x, y):
            return False
        for h in self.holes:
            if _point_in_ring(h, x, y):
                return False
        return True

    def contains_points(self, pts: np.ndarray) -> np.ndarray:
        """Vectorized containment for (N, 2) points."""
        pts = np.asarray(pts, np.float64)
        inside = _points_in_ring(self.exterior, pts)
        for h in self.holes:
            inside &= ~_points_in_ring(h, pts)
        return inside

    # -------------------------------------------------------------- validity
    @property
    def is_valid(self) -> bool:
        """True if the exterior ring is simple (no self-intersection) and
        has nonzero area — the property the reference checks via shapely
        before accepting a cell contour (predict_wsi.py:625-630)."""
        r = self.exterior
        if len(r) < 3:
            return False
        if abs(self._ring_area(r)) < 1e-12:
            return False
        return not _ring_self_intersects(r)


def _point_in_ring(ring: np.ndarray, x: float, y: float) -> bool:
    return bool(_points_in_ring(ring, np.array([[x, y]]))[0])


def _points_in_ring(ring: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """Ray casting, vectorized over points (edges looped — rings are short
    relative to point counts in the WSI filters)."""
    x, y = pts[:, 0], pts[:, 1]
    inside = np.zeros(len(pts), bool)
    x1, y1 = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    for i in range(len(ring)):
        xi, yi, xj, yj = x1[i], y1[i], x2[i], y2[i]
        cond = (yi > y) != (yj > y)
        if not cond.any():
            continue
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (y - yi) / (yj - yi)
        xcross = xi + t * (xj - xi)
        inside ^= cond & (x < xcross)
    return inside


def _segments_intersect(p1, p2, p3, p4) -> bool:
    """Proper intersection test for segments p1p2 and p3p4 (touching at
    shared endpoints is allowed)."""

    def orient(a, b, c):
        v = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        return 0 if abs(v) < 1e-12 else (1 if v > 0 else -1)

    o1, o2 = orient(p1, p2, p3), orient(p1, p2, p4)
    o3, o4 = orient(p3, p4, p1), orient(p3, p4, p2)
    return o1 != o2 and o3 != o4 and 0 not in (o1, o2, o3, o4)


def _ring_self_intersects(ring: np.ndarray) -> bool:
    n = len(ring)
    segs = [(ring[i], ring[(i + 1) % n]) for i in range(n)]
    # bbox prefilter
    bb = np.array(
        [
            [
                min(a[0], b[0]), min(a[1], b[1]),
                max(a[0], b[0]), max(a[1], b[1]),
            ]
            for a, b in segs
        ]
    )
    for i in range(n):
        for j in range(i + 2, n):
            if i == 0 and j == n - 1:
                continue  # adjacent via wraparound
            if (
                bb[i, 2] < bb[j, 0] or bb[j, 2] < bb[i, 0]
                or bb[i, 3] < bb[j, 1] or bb[j, 3] < bb[i, 1]
            ):
                continue
            if _segments_intersect(*segs[i], *segs[j]):
                return True
    return False


def intersection_area(a: "Polygon", b: "Polygon",
                      max_canvas: int = 2048) -> float:
    """Area of ``a ∩ b`` by rasterizing both fills over the bbox overlap
    (first-party stand-in for shapely's
    ``artefact_poly.intersection(roi_poly).area`` used by the reference's
    per-ROI density correction, predict_wsi.py:1818-1824).

    Level-0 WSI coordinates can span 100k px, so the canvas is scaled to
    at most ``max_canvas`` per side; the error is O(perimeter·pixel_size),
    negligible against the ROI/tissue areas this feeds (a density
    denominator)."""
    import cv2

    ax0, ay0, ax1, ay1 = a.bounds
    bx0, by0, bx1, by1 = b.bounds
    x0, y0 = max(ax0, bx0), max(ay0, by0)
    x1, y1 = min(ax1, bx1), min(ay1, by1)
    if x1 <= x0 or y1 <= y0:
        return 0.0
    w, h = x1 - x0, y1 - y0
    scale = min(1.0, max_canvas / max(w, h, 1.0))
    W = int(np.ceil(w * scale)) + 2
    H = int(np.ceil(h * scale)) + 2

    def rasterize(p: Polygon) -> np.ndarray:
        m = np.zeros((H, W), np.uint8)
        ext = np.round((p.exterior - [x0, y0]) * scale).astype(np.int32)
        cv2.fillPoly(m, [ext], 1)
        for hole in p.holes:
            hr = np.round((hole - [x0, y0]) * scale).astype(np.int32)
            cv2.fillPoly(m, [hr], 0)
        return m

    inter = int((rasterize(a) & rasterize(b)).sum())
    return inter / (scale * scale)


def make_valid(coords: np.ndarray, grid_pad: int = 2) -> list[np.ndarray]:
    """Repair a (possibly self-intersecting) ring by rasterizing its
    even-odd fill and re-extracting outer contours.

    Functional stand-in for the reference's shapely ``make_valid`` +
    ``buffer(0)`` fallback chain (predict_wsi.py:1029-1083): returns a list
    of simple exterior rings (possibly several if the input pinched into
    multiple lobes). Coordinates are preserved up to 1 px rasterization
    error, which is below the dedup radius used downstream.
    """
    import cv2

    coords = np.asarray(coords, np.float64)
    if len(coords) < 3:
        return []
    mn = coords.min(axis=0)
    shifted = coords - mn + grid_pad
    size = np.ceil(shifted.max(axis=0)).astype(int) + grid_pad + 1
    canvas = np.zeros((int(size[1]), int(size[0])), np.uint8)
    cv2.fillPoly(canvas, [np.round(shifted).astype(np.int32)], 1)
    contours, _ = cv2.findContours(
        canvas, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE
    )
    out = []
    for c in contours:
        ring = c[:, 0].astype(np.float64) + mn - grid_pad
        if len(ring) >= 3:
            out.append(ring)
    return out
