"""Cross-tile cell deduplication.

Same algorithm as the reference ``deduplicate`` (predict_wsi.py:896-965):
KD-tree over cell centroids, pair all centers closer than ``max_dist``
(default 7.5 px at model MPP), union pairs into groups with the reference's
first-come group assignment, and keep only the largest cell of each group.

Two implementations with identical output:

- native (geomfast ``dedup_keep``): grid-hash pair search + the greedy
  grouping in C++ — the 262k-cell slide benchmark measured the pure-Python
  form at ~52 s, a serial tail that scales with cell count (VERDICT r4);
  the native pass is O(n + pairs) and runs in well under a second.
- pure Python (fallback, and the oracle that pins the native path in
  tests/test_dedup_native.py).

Pairs are processed in SORTED (a, b) order in both paths. The reference
iterates a Python ``set`` of pairs, whose order is arbitrary — and its
greedy grouping is order-sensitive when a pair bridges two existing
groups — so sorting makes the (otherwise reference-exact) result
deterministic rather than hash-order-dependent.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree

from classpose_tpu.log import get_logger

logger = get_logger(__name__)


def _centers_sizes(features: list[dict]):
    """(n, 2) float64 centers + (n,) sizes from the measurement lists.

    Fast path indexes the fixed [area, perimeter, centroidX, centroidY]
    layout written by ``to_geojson_polygon``; any feature that deviates
    falls back to a name scan (external GeoJSON input)."""
    n = len(features)
    centers = np.empty((n, 2), np.float64)
    sizes = np.empty(n, np.float64)
    for i, feature in enumerate(features):
        ms = feature["properties"]["measurements"]
        if (
            len(ms) == 4
            and ms[0]["name"] == "area"
            and ms[2]["name"] == "centroidX"
            and ms[3]["name"] == "centroidY"
        ):
            sizes[i] = ms[0]["value"]
            centers[i, 0] = ms[2]["value"]
            centers[i, 1] = ms[3]["value"]
        else:
            sizes[i] = next(
                m["value"] for m in ms if m["name"] == "area"
            )
            centers[i, 0] = next(
                m["value"] for m in ms if m["name"] == "centroidX"
            )
            centers[i, 1] = next(
                m["value"] for m in ms if m["name"] == "centroidY"
            )
    return centers, sizes


def _keep_mask_python(
    centers: np.ndarray, sizes: np.ndarray, max_dist: float
) -> np.ndarray:
    """Reference greedy grouping over sorted KD-tree pairs → keep mask."""
    tree = cKDTree(centers)
    pairs = sorted(tree.query_pairs(max_dist))

    groups: dict[int, list[int]] = {}
    member_to_group: dict[int, int] = {}
    for a, b in pairs:
        if a not in member_to_group and b not in member_to_group:
            gid = len(groups)
            groups[gid] = []
            member_to_group[a] = gid
            member_to_group[b] = gid
        else:
            gid = member_to_group.get(a, member_to_group.get(b))
        if a not in groups[gid]:
            groups[gid].append(a)
        if b not in groups[gid]:
            groups[gid].append(b)

    keep = np.ones(len(centers), bool)
    for group in groups.values():
        if len(group) > 1:
            largest = group[int(np.argmax([sizes[i] for i in group]))]
            for i in group:
                if i != largest:
                    keep[i] = False
    return keep


def _keep_mask_native(
    centers: np.ndarray, sizes: np.ndarray, max_dist: float
) -> np.ndarray | None:
    from classpose_tpu.native import load_geomfast

    lib = load_geomfast()
    if lib is None or not hasattr(lib, "dedup_keep"):
        return None
    import ctypes

    c = np.ascontiguousarray(centers, np.float64)
    s = np.ascontiguousarray(sizes, np.float64)
    keep = np.empty(len(c), np.uint8)
    lib.dedup_keep(
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(c), float(max_dist),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    return keep.astype(bool)


def deduplicate(features: list[dict], max_dist: float = 15 / 2) -> list[dict]:
    """Deduplicate GeoJSON cell features based on centroid distance,
    keeping the largest area in each near-duplicate group."""
    if not features:
        return features
    centers, sizes = _centers_sizes(features)
    keep = _keep_mask_native(centers, sizes, max_dist)
    if keep is None:
        keep = _keep_mask_python(centers, sizes, max_dist)
    output = [f for f, k in zip(features, keep) if k]
    logger.info(f"Removed {len(features) - len(output)} duplicates.")
    logger.info(f"Number of cells: {len(output)}")
    return output
