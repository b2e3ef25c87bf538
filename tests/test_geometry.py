"""Geometry core tests: polygon metrics, validity, repair, STRtree, dedup,
and the tile postprocessor."""

import numpy as np

from classpose_tpu.geometry import Polygon, STRtree, deduplicate, make_valid
from classpose_tpu.pipeline.postprocess import process_tile


def square(x0, y0, s):
    return Polygon([[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s]])


def test_polygon_metrics():
    p = square(0, 0, 10)
    assert abs(p.area - 100) < 1e-9
    assert abs(p.length - 40) < 1e-9
    assert np.allclose(p.centroid, (5, 5))
    assert p.bounds == (0, 0, 10, 10)


def test_polygon_with_hole():
    p = Polygon(
        [[0, 0], [10, 0], [10, 10], [0, 10]],
        holes=[[[4, 4], [6, 4], [6, 6], [4, 6]]],
    )
    assert abs(p.area - 96) < 1e-9
    assert p.contains_point(1, 1)
    assert not p.contains_point(5, 5)  # inside the hole
    assert not p.contains_point(11, 5)


def test_validity_bowtie():
    bowtie = Polygon([[0, 0], [10, 10], [10, 0], [0, 10]])
    assert not bowtie.is_valid
    assert square(0, 0, 5).is_valid
    # degenerate: zero area
    assert not Polygon([[0, 0], [5, 5], [10, 10]]).is_valid


def test_make_valid_repairs_bowtie():
    rings = make_valid(np.array([[0, 0], [10, 10], [10, 0], [0, 10]]))
    assert len(rings) >= 1
    total = sum(abs(Polygon(r).area) for r in rings)
    assert 30 < total < 70  # bowtie halves ≈ 2×25


def test_strtree_queries():
    polys = [square(i * 20, 0, 10) for i in range(50)]
    tree = STRtree(polys)
    hits = tree.query_bbox((95, 2, 125, 8))
    assert set(hits.tolist()) >= {5, 6}
    pts = np.array([[5, 5], [25, 5], [15, 5], [1000, 5]])
    inside = tree.contains_points(pts)
    assert inside.tolist() == [True, True, False, False]
    assert tree.intersects_bbox((12, 2, 18, 8)) is False
    assert tree.intersects_bbox((5, 2, 18, 8)) is True


def test_strtree_empty():
    tree = STRtree([])
    assert len(tree.query_bbox((0, 0, 1, 1))) == 0
    assert tree.contains_points(np.zeros((3, 2))).sum() == 0


def _feature(x, y, area):
    return {
        "properties": {
            "measurements": [
                {"name": "area", "value": area},
                {"name": "centroidX", "value": x},
                {"name": "centroidY", "value": y},
            ]
        }
    }


def test_deduplicate_keeps_largest():
    feats = [
        _feature(0, 0, 50),
        _feature(3, 0, 80),  # within 7.5 of the first → duplicate group
        _feature(100, 100, 60),
    ]
    out = deduplicate(feats)
    assert len(out) == 2
    areas = [
        next(m["value"] for m in f["properties"]["measurements"]
             if m["name"] == "area")
        for f in out
    ]
    assert 80 in areas and 60 in areas and 50 not in areas


def test_process_tile_features():
    masks = np.zeros((64, 64), np.int32)
    masks[10:20, 10:22] = 1
    masks[40:50, 40:48] = 2
    class_masks = np.where(masks == 1, 2, 0) + np.where(masks == 2, 3, 0)
    cells, n_invalid = process_tile(
        masks, class_masks, tile_origin=(1000.0, 2000.0),
        prediction_to_slide_scale=2.0,
        labels=["A", "B", "C"],
    )
    assert n_invalid == 0
    assert len(cells) == 2
    c1 = cells[0]
    assert c1["label"] == "B"  # class 2 → index 1
    # origin offset + scale applied: bbox of coords inside expected region
    xs = [p[0] for p in c1["coords"]]
    ys = [p[1] for p in c1["coords"]]
    assert min(xs) >= 1000 and max(xs) <= 1000 + 64 * 2
    assert min(ys) >= 2000 and max(ys) <= 2000 + 64 * 2
    # closed ring
    assert c1["coords"][0] == c1["coords"][-1]
    assert cells[1]["label"] == "C"


def test_process_tile_single_class_mode():
    masks = np.zeros((32, 32), np.int32)
    masks[5:15, 5:15] = 1
    cells, _ = process_tile(masks, None, (0, 0), 1.0, labels=None)
    assert cells[0]["label"] == "cell"
    assert cells[0]["color"] == [0, 168, 132]
