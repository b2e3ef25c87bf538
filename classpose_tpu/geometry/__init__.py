"""Host-side computational geometry.

The reference leans on shapely/GEOS for polygon features, validity checks,
repair, and STRtree spatial joins (predict_wsi.py:896-1333, outputs.py).
This environment has no GEOS, so the framework ships its own small geometry
core: shoelace metrics, ray-casting containment, segment-intersection
validity, rasterization-based repair, an STR-packed R-tree, and KD-tree
centroid deduplication (scipy)."""

from classpose_tpu.geometry.polygons import (
    Polygon,
    intersection_area,
    make_valid,
)
from classpose_tpu.geometry.strtree import STRtree
from classpose_tpu.geometry.dedup import deduplicate

__all__ = [
    "Polygon", "intersection_area", "make_valid", "STRtree", "deduplicate",
]
