"""Polygon primitives: shoelace metrics, containment, validity, repair.

Replaces the shapely usage of the reference pipeline
(PostProcessor validity check predict_wsi.py:625-640, make_valid repair
:1029-1083, ROI containment :1247-1333) without a GEOS dependency.
"""

from __future__ import annotations

import ctypes

import numpy as np

from classpose_tpu.native import load_geomfast


def _ring_metrics(r: np.ndarray) -> tuple[float, float, float, float]:
    """(signed_area, cx, cy, perimeter) of one ring — native C++ core
    when available (this runs once per detected cell), numpy fallback
    with identical semantics."""
    n = len(r)
    lib = load_geomfast()
    if lib is not None and n >= 1:
        rc = np.ascontiguousarray(r, np.float64)
        out = np.empty(4, np.float64)
        lib.ring_metrics(
            rc.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return float(out[0]), float(out[1]), float(out[2]), float(out[3])
    c, wrap = Polygon._edge_cross(r)
    a2 = float(c.sum()) + wrap
    x, y = r[:, 0], r[:, 1]
    if abs(a2) < 2e-12:
        cx, cy = float(x.mean()), float(y.mean())
    else:
        cx = (float(np.dot(x[:-1] + x[1:], c)) + (x[-1] + x[0]) * wrap) / (
            3.0 * a2
        )
        cy = (float(np.dot(y[:-1] + y[1:], c)) + (y[-1] + y[0]) * wrap) / (
            3.0 * a2
        )
    d = r[1:] - r[:-1]
    per = float(np.sqrt((d**2).sum(axis=1)).sum())
    last = r[0] - r[-1]
    per += float(np.sqrt(last[0] ** 2 + last[1] ** 2))
    return 0.5 * a2, cx, cy, per


class Polygon:
    """A simple polygon with optional holes.

    ``exterior``: (N, 2) array of (x, y); closed or open rings accepted
    (a closing vertex equal to the first is dropped internally).
    """

    __slots__ = ("exterior", "holes", "_bounds", "_rm")

    def __init__(self, exterior, holes=None):
        ext = np.asarray(exterior, np.float64)
        # same tolerance as np.allclose(ext[0], ext[-1]) without its
        # per-call machinery (this constructor runs once per cell)
        if len(ext) >= 2 and (
            abs(ext[0, 0] - ext[-1, 0])
            <= 1e-8 + 1e-5 * abs(ext[-1, 0])
            and abs(ext[0, 1] - ext[-1, 1])
            <= 1e-8 + 1e-5 * abs(ext[-1, 1])
        ):
            ext = ext[:-1]
        self.exterior = ext
        self.holes = [
            np.asarray(h, np.float64)[
                : -1 if len(h) >= 2 and np.allclose(h[0], h[-1]) else None
            ]
            for h in (holes or [])
        ]
        self._bounds = None
        self._rm = None

    @property
    def _ext_metrics(self) -> tuple[float, float, float, float]:
        """Cached (signed_area, cx, cy, perimeter) of the exterior."""
        if self._rm is None:
            self._rm = _ring_metrics(self.exterior)
        return self._rm

    # -------------------------------------------------------------- metrics
    # cross terms are computed with slices (edges 0..n−2 plus the closing
    # edge) rather than np.roll: the cell post-processor calls these for
    # every instance of every tile, and roll's per-call overhead was the
    # second-largest host cost after the validity check

    @staticmethod
    def _edge_cross(r: np.ndarray) -> tuple[np.ndarray, float]:
        """Per-edge shoelace cross products x_k·y_{k+1} − x_{k+1}·y_k for
        edges 0..n−2, plus the closing edge's term."""
        x, y = r[:, 0], r[:, 1]
        c = x[:-1] * y[1:] - x[1:] * y[:-1]
        wrap = float(x[-1] * y[0] - x[0] * y[-1])
        return c, wrap

    @staticmethod
    def _ring_area(r: np.ndarray) -> float:
        return _ring_metrics(r)[0]

    @property
    def area(self) -> float:
        a = abs(self._ext_metrics[0])
        for h in self.holes:
            a -= abs(_ring_metrics(h)[0])
        return a

    @property
    def length(self) -> float:
        total = self._ext_metrics[3]
        for h in self.holes:
            total += _ring_metrics(h)[3]
        return total

    @property
    def centroid(self) -> tuple[float, float]:
        m = self._ext_metrics
        return m[1], m[2]

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
        if abs(self._ext_metrics[0]) < 1e-12:
            return False
        return not _ring_self_intersects(r)


def rings_batch_metrics_packed(
    xy: np.ndarray, offs: np.ndarray
) -> np.ndarray:
    """(m, 5) [signed_area, cx, cy, perimeter, simple] for m open rings
    PACKED in one (N, 2) float64 buffer with (m+1,) vertex offsets —
    skips the per-ring list + concatenate of :func:`rings_batch_metrics`
    (process_tile's native path already holds contours packed)."""
    m = len(offs) - 1
    out = np.empty((m, 5), np.float64)
    if m == 0:
        return out
    lib = load_geomfast()
    if lib is not None:
        xc = np.ascontiguousarray(xy, np.float64)
        oc = np.ascontiguousarray(offs, np.int64)
        lib.rings_batch(
            xc.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            oc.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
            m,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return out
    for k in range(m):
        r = xy[offs[k] : offs[k + 1]]
        out[k, :4] = _ring_metrics(r)
        out[k, 4] = 0.0 if _ring_self_intersects(r) else 1.0
    return out


def rings_batch_metrics(rings: list[np.ndarray]) -> np.ndarray:
    """(m, 5) [signed_area, cx, cy, perimeter, simple] for a list of open
    (N, 2) float64 rings — ONE native call for the whole batch (the
    per-cell ctypes round trips dominated validity cost at WSI cell
    counts). Numpy fallback loops :func:`_ring_metrics` +
    :func:`_ring_self_intersects` with identical semantics."""
    m = len(rings)
    out = np.empty((m, 5), np.float64)
    if m == 0:
        return out
    lib = load_geomfast()
    if lib is not None:
        offs = np.zeros(m + 1, np.int64)
        np.cumsum([len(r) for r in rings], out=offs[1:])
        xy = np.concatenate(rings, axis=0) if m > 1 else rings[0]
        xy = np.ascontiguousarray(xy, np.float64)
        lib.rings_batch(
            xy.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
            m,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return out
    for k, r in enumerate(rings):
        out[k, :4] = _ring_metrics(r)
        out[k, 4] = 0.0 if _ring_self_intersects(r) else 1.0
    return out


def _point_in_ring(ring: np.ndarray, x: float, y: float) -> bool:
    return bool(_points_in_ring(ring, np.array([[x, y]]))[0])


def _points_in_ring(ring: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """Ray casting, vectorized over points (edges looped — rings are short
    relative to point counts in the WSI filters)."""
    lib = load_geomfast()
    if lib is not None and len(ring) and len(pts):
        rc = np.ascontiguousarray(ring, np.float64)
        pc = np.ascontiguousarray(pts, np.float64)
        out = np.empty(len(pts), np.uint8)
        lib.points_in_ring(
            rc.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(ring),
            pc.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(pts),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        )
        return out.astype(bool)
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
    """Vectorized all-pairs proper-intersection test (same semantics as
    :func:`_segments_intersect` pair-by-pair: endpoint touching and
    collinear overlap do not count). The o-matrices satisfy
    o3 = o1ᵀ, o4 = o2ᵀ, so only two (n, n) orientation grids are built;
    rows are processed in blocks to bound memory for huge ROI rings."""
    n = len(ring)
    if n < 4:
        return False
    lib = load_geomfast()
    if lib is not None:
        rc = np.ascontiguousarray(ring, np.float64)
        return not bool(
            lib.ring_simple(
                rc.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n
            )
        )
    p1 = ring
    p2 = np.concatenate([ring[1:], ring[:1]])

    ax, ay = p1[:, 0], p1[:, 1]
    bx, by = p2[:, 0], p2[:, 1]

    def osign(v):
        s = np.sign(v)
        s[np.abs(v) < 1e-12] = 0
        return s.astype(np.int8)

    # o1[i, j] = orient(p1_i, p2_i, p1_j); o2[i, j] = orient(·, ·, p2_j)
    ux, uy = bx - ax, by - ay
    block = 256 if n > 512 else n
    o1 = np.empty((n, n), np.int8)
    o2 = np.empty((n, n), np.int8)
    for s in range(0, n, block):
        e = min(s + block, n)
        o1[s:e] = osign(
            ux[s:e, None] * (ay[None, :] - ay[s:e, None])
            - uy[s:e, None] * (ax[None, :] - ax[s:e, None])
        )
        o2[s:e] = osign(
            ux[s:e, None] * (by[None, :] - ay[s:e, None])
            - uy[s:e, None] * (bx[None, :] - ax[s:e, None])
        )
    inter = (
        (o1 != o2)
        & (o1.T != o2.T)
        & (o1 != 0) & (o2 != 0) & (o1.T != 0) & (o2.T != 0)
    )
    # exclude self and adjacent pairs (incl. the 0 ↔ n−1 wraparound)
    idx = np.arange(n)
    inter[idx, idx] = False
    inter[idx, (idx + 1) % n] = False
    inter[(idx + 1) % n, idx] = False
    return bool(inter.any())


# --------------------------------------------------------------------------
# Exact polygon-intersection area (VERDICT r2 item 4)
#
# area(A ∩ B) via the boundary integral ½∮(x dy − y dx): the boundary of
# A∩B is exactly {pieces of ∂A inside B} ∪ {pieces of ∂B inside A}, each
# traversed with its own (exterior-CCW / hole-CW) orientation, and the
# shoelace contribution cross(p0, p1)/2 of a directed boundary piece is
# independent of the order pieces are visited — so no clipped polygon ever
# needs to be constructed. Boundary-on-boundary pieces (shared edges) are
# weighted ½ from each side, which sums to the correct single count.
# Replaces the former ≤2048px rasterization (±1px ring error) with an
# exact computation (reference uses shapely/GEOS intersection().area,
# predict_wsi.py:1029-1083, outputs.py:148-273).
# --------------------------------------------------------------------------


def _oriented_rings(p: "Polygon") -> list[np.ndarray]:
    """Rings of ``p`` with canonical orientation: exterior CCW (positive
    shoelace), holes CW — the orientation of ∂p as a region boundary."""
    rings = []
    ext = p.exterior
    if Polygon._ring_area(ext) < 0:
        ext = ext[::-1]
    rings.append(ext)
    for h in p.holes:
        if len(h) < 3:
            continue
        rings.append(h[::-1] if Polygon._ring_area(h) > 0 else h)
    return rings


def _segment_cross_params(p: np.ndarray, q: np.ndarray,
                          ring: np.ndarray) -> np.ndarray:
    """Parameters t ∈ (0, 1) where segment p + t(q−p) meets ring edges
    (vectorized over the ring; includes touching/collinear endpoints)."""
    d = q - p
    a = ring
    b = np.roll(ring, -1, axis=0)
    e = b - a
    denom = d[0] * e[:, 1] - d[1] * e[:, 0]
    w = a - p
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (w[:, 0] * e[:, 1] - w[:, 1] * e[:, 0]) / denom
        u = (w[:, 0] * d[1] - w[:, 1] * d[0]) / denom
    ok = np.isfinite(t) & np.isfinite(u)
    ok &= (t > 0.0) & (t < 1.0) & (u >= 0.0) & (u <= 1.0)
    ts = [t[ok]]
    # collinear edges (denom == 0 and w × d == 0): split at the
    # projections of the ring edge's endpoints onto pq
    col = (np.abs(denom) < 1e-30) & (
        np.abs(w[:, 0] * d[1] - w[:, 1] * d[0]) < 1e-12
    )
    if col.any():
        dd = float(d @ d)
        if dd > 0:
            for pt in (a[col], b[col]):
                tp = (pt - p) @ d / dd
                ts.append(tp[(tp > 0.0) & (tp < 1.0)])
    return np.concatenate(ts) if ts else np.empty(0)


def _on_boundary(pt: np.ndarray, rings: list[np.ndarray],
                 eps: float) -> bool:
    """True if ``pt`` lies within ``eps`` of any ring segment."""
    for ring in rings:
        a = ring
        b = np.roll(ring, -1, axis=0)
        e = b - a
        w = pt[None, :] - a
        ee = (e * e).sum(1)
        t = np.clip(
            np.divide((w * e).sum(1), ee, out=np.zeros_like(ee),
                      where=ee > 0),
            0.0, 1.0,
        )
        close = a + t[:, None] * e
        if (((pt[None, :] - close) ** 2).sum(1) < eps * eps).any():
            return True
    return False


def _boundary_piece_sum(a: "Polygon", b: "Polygon", eps: float) -> float:
    """Σ shoelace contributions of the pieces of ∂a that lie inside b
    (weight ½ for pieces running along ∂b)."""
    b_rings = [b.exterior, *b.holes]
    s = 0.0
    for ring in _oriented_rings(a):
        n = len(ring)
        for i in range(n):
            p0 = ring[i]
            p1 = ring[(i + 1) % n]
            ts = [np.array([0.0, 1.0])]
            for br in b_rings:
                ts.append(_segment_cross_params(p0, p1, br))
            t = np.unique(np.clip(np.concatenate(ts), 0.0, 1.0))
            d = p1 - p0
            for t0, t1 in zip(t[:-1], t[1:]):
                if t1 - t0 <= 1e-15:
                    continue
                mid = p0 + (0.5 * (t0 + t1)) * d
                if _on_boundary(mid, b_rings, eps):
                    w = 0.5
                elif b.contains_point(float(mid[0]), float(mid[1])):
                    w = 1.0
                else:
                    continue
                q0 = p0 + t0 * d
                q1 = p0 + t1 * d
                s += w * 0.5 * (q0[0] * q1[1] - q1[0] * q0[1])
    return s


def intersection_area(a: "Polygon", b: "Polygon") -> float:
    """EXACT area of ``a ∩ b`` (concave polygons and holes supported) via
    the boundary-integral decomposition above — float-precision equivalent
    of shapely's ``a.intersection(b).area`` as used by the reference's
    per-ROI artefact density correction (predict_wsi.py:1818-1824)."""
    ax0, ay0, ax1, ay1 = a.bounds
    bx0, by0, bx1, by1 = b.bounds
    if min(ax1, bx1) <= max(ax0, bx0) or min(ay1, by1) <= max(ay0, by0):
        return 0.0
    diag = max(ax1 - ax0, ay1 - ay0, bx1 - bx0, by1 - by0, 1.0)
    eps = 1e-9 * diag
    total = _boundary_piece_sum(a, b, eps) + _boundary_piece_sum(b, a, eps)
    return max(total, 0.0)


# --------------------------------------------------------------------------
# Exact make_valid (VERDICT r2 item 4)
#
# Even-odd repair of a self-intersecting ring via a planar arrangement:
# node every segment at its pairwise intersections, classify the fill
# parity on each side of every sub-edge (even-odd ray cast at an
# ε-offset midpoint against the ORIGINAL ring), keep the directed edges
# with odd fill on their left, and trace them into closed rings with the
# standard most-clockwise-turn rule. CCW output rings are exteriors, CW
# rings are holes. This matches GEOS buffer(0)/make_valid semantics for
# self-intersecting rings (reference predict_wsi.py:1029-1083) to float
# precision; the former cv2 rasterization (±1 px) remains only as an
# exception fallback.
# --------------------------------------------------------------------------


def _node_segments(ring: np.ndarray):
    """Split ring edges at all pairwise intersections. Returns a list of
    (p, q) sub-segments with coordinates snapped to 1e-9·scale."""
    n = len(ring)
    scale = float(
        max(np.ptp(ring[:, 0]), np.ptp(ring[:, 1]), 1.0)
    )
    snap = 1e-9 * scale
    segs = []
    for i in range(n):
        p = ring[i]
        q = ring[(i + 1) % n]
        if ((q - p) ** 2).sum() < snap * snap:
            continue
        ts = [np.array([0.0, 1.0]),
              _segment_cross_params(p, q, ring)]
        t = np.unique(np.clip(np.concatenate(ts), 0.0, 1.0))
        d = q - p
        for t0, t1 in zip(t[:-1], t[1:]):
            a = p + t0 * d
            b = p + t1 * d
            if ((b - a) ** 2).sum() >= snap * snap:
                segs.append((a, b))

    def key(pt):
        return (round(float(pt[0]) / snap), round(float(pt[1]) / snap))

    verts: dict = {}
    out = []
    for a, b in segs:
        ka, kb = key(a), key(b)
        if ka == kb:
            continue
        va = verts.setdefault(ka, np.array(a, np.float64))
        vb = verts.setdefault(kb, np.array(b, np.float64))
        out.append((ka, kb, va, vb))
    return out


def _parity(pt: np.ndarray, ring: np.ndarray) -> int:
    """Even-odd crossing parity of ``pt`` against the original ring."""
    return int(_points_in_ring(ring, pt[None, :])[0])


def make_valid(coords: np.ndarray) -> list[np.ndarray]:
    """Repair a (possibly self-intersecting) ring into simple rings
    covering its even-odd fill. Returns CCW exterior rings (holes of the
    repaired region, if any, are returned as CW rings appended after the
    exteriors they belong to are not needed by current callers and are
    dropped)."""
    coords = np.asarray(coords, np.float64)
    if len(coords) >= 2 and np.allclose(coords[0], coords[-1]):
        coords = coords[:-1]
    if len(coords) < 3:
        return []
    try:
        return _make_valid_exact(coords)
    except Exception:  # pragma: no cover - degenerate-input fallback
        return _make_valid_raster(coords)


def _make_valid_exact(ring: np.ndarray) -> list[np.ndarray]:
    scale = float(max(np.ptp(ring[:, 0]), np.ptp(ring[:, 1]), 1.0))
    eps = 1e-7 * scale
    noded = _node_segments(ring)
    if not noded:
        return []

    # directed edges with ODD fill on the left (region boundary,
    # interior-on-left convention)
    kept: dict = {}  # tail key -> list of (head key, tail pt, head pt)
    for ka, kb, a, b in noded:
        d = b - a
        ln = float(np.hypot(d[0], d[1]))
        if ln <= 0:
            continue
        nrm = np.array([-d[1], d[0]]) / ln  # left normal of a→b
        mid = 0.5 * (a + b)
        left = _parity(mid + eps * nrm, ring)
        right = _parity(mid - eps * nrm, ring)
        if left == right:
            continue
        if left:
            kept.setdefault(ka, []).append((kb, a, b))
        else:
            kept.setdefault(kb, []).append((ka, b, a))

    rings_out: list[np.ndarray] = []
    used: set = set()
    for start_key in list(kept):
        for edge in kept[start_key]:
            eid = (start_key, edge[0])
            if eid in used:
                continue
            # trace a loop keeping the region on the left: at each head
            # vertex pick the unused outgoing edge making the sharpest
            # clockwise turn from the incoming reverse direction
            loop = [edge[1]]
            cur_key, cur_edge = start_key, edge
            ok = True
            for _ in range(len(noded) * 2 + 4):
                used.add((cur_key, cur_edge[0]))
                loop.append(cur_edge[2])
                head = cur_edge[0]
                if head == start_key and len(loop) > 2:
                    break
                outs = [
                    e for e in kept.get(head, [])
                    if (head, e[0]) not in used
                ]
                if not outs:
                    ok = False
                    break
                d_in = cur_edge[2] - cur_edge[1]
                ang_in = np.arctan2(d_in[1], d_in[0]) + np.pi  # reverse

                def turn(e):
                    d_out = e[2] - e[1]
                    ang = np.arctan2(d_out[1], d_out[0])
                    # angle CCW from reverse(in) to out, in (0, 2π]
                    t = (ang - ang_in) % (2 * np.pi)
                    return t if t > 1e-12 else 2 * np.pi

                nxt = max(outs, key=turn)  # most-CCW = region-on-left
                cur_key, cur_edge = head, nxt
            else:
                ok = False
            if ok and len(loop) > 3:
                r = np.asarray(loop[:-1], np.float64)
                if Polygon._ring_area(r) > 0:  # CCW → exterior
                    rings_out.append(r)
    if not rings_out:
        # fully degenerate (zero-area) input
        return []
    return rings_out


def _make_valid_raster(coords: np.ndarray,
                       grid_pad: int = 2) -> list[np.ndarray]:
    """cv2 rasterization fallback (±1 px) for inputs the exact
    arrangement cannot handle."""
    import cv2

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
