"""Cross-tile cell deduplication.

Same algorithm as the reference ``deduplicate`` (predict_wsi.py:896-965):
KD-tree over cell centroids, pair all centers closer than ``max_dist``
(default 7.5 px at model MPP), union pairs into groups with the reference's
first-come group assignment, and keep only the largest cell of each group.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree

from classpose_tpu.log import get_logger

logger = get_logger(__name__)


def deduplicate(features: list[dict], max_dist: float = 15 / 2) -> list[dict]:
    """Deduplicate GeoJSON cell features based on centroid distance,
    keeping the largest area in each near-duplicate group."""
    if not features:
        return features
    centers = []
    sizes = []
    for feature in features:
        ms = feature["properties"]["measurements"]
        sizes.append(
            next(m["value"] for m in ms if m["name"] == "area")
        )
        centers.append(
            [
                next(m["value"] for m in ms if m["name"] == "centroidX"),
                next(m["value"] for m in ms if m["name"] == "centroidY"),
            ]
        )
    tree = cKDTree(np.asarray(centers))
    pairs = tree.query_pairs(max_dist)

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

    to_remove: set[int] = set()
    for group in groups.values():
        if len(group) > 1:
            largest = group[int(np.argmax([sizes[i] for i in group]))]
            to_remove.update(i for i in group if i != largest)

    output = [f for i, f in enumerate(features) if i not in to_remove]
    logger.info(f"Removed {len(to_remove)} duplicates.")
    logger.info(f"Number of cells: {len(output)}")
    return output
