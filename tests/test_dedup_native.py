"""Native dedup_keep vs the pure-Python greedy grouping oracle.

Both must produce IDENTICAL keep sets (VERDICT r4 item 4 acceptance):
the native grid-hash pair search must find exactly scipy's
``query_pairs(r)`` set (d <= r), and the C++ greedy grouping replicates
the reference's order-sensitive loop over sorted pairs — including its
cross-group quirks (a bridging pair appends to the first member's group
without remapping the second member).
"""

import numpy as np
import pytest

from classpose_tpu.geometry.dedup import (
    _keep_mask_native,
    _keep_mask_python,
    deduplicate,
)
from classpose_tpu.native import load_geomfast

pytestmark = pytest.mark.skipif(
    load_geomfast() is None, reason="native geomfast unavailable"
)


def clustered_points(rng, n_clusters, spread, n_per=3, extent=5000.0):
    """Clusters of near-duplicate centroids, the dedup workload shape."""
    base = rng.uniform(0, extent, size=(n_clusters, 2))
    pts = (
        base[:, None, :] + rng.normal(0, spread, size=(n_clusters, n_per, 2))
    ).reshape(-1, 2)
    sizes = rng.uniform(10, 500, size=len(pts))
    return pts, sizes


@pytest.mark.parametrize("seed", range(6))
def test_native_matches_python(seed):
    rng = np.random.default_rng(seed)
    pts, sizes = clustered_points(rng, 400, spread=4.0)
    # add isolated singles and exact-duplicate coordinates
    singles = rng.uniform(0, 5000, size=(300, 2))
    pts = np.concatenate([pts, singles, pts[:5]])
    sizes = np.concatenate(
        [sizes, rng.uniform(10, 500, size=300), sizes[:5]]
    )
    kn = _keep_mask_native(pts, sizes, 7.5)
    kp = _keep_mask_python(pts, sizes, 7.5)
    np.testing.assert_array_equal(kn, kp)


def test_chain_bridging_groups():
    """A chain a-b, c-d, b-c exercises the cross-group append quirk."""
    pts = np.array(
        [[0.0, 0.0], [5.0, 0.0], [10.0, 0.0], [15.0, 0.0]]
    )
    sizes = np.array([1.0, 2.0, 4.0, 3.0])
    kn = _keep_mask_native(pts, sizes, 7.0)
    kp = _keep_mask_python(pts, sizes, 7.0)
    np.testing.assert_array_equal(kn, kp)


def test_boundary_distance_inclusive():
    """query_pairs uses d <= r: a pair at exactly max_dist must group."""
    pts = np.array([[0.0, 0.0], [7.5, 0.0], [100.0, 0.0]])
    sizes = np.array([1.0, 2.0, 3.0])
    kn = _keep_mask_native(pts, sizes, 7.5)
    kp = _keep_mask_python(pts, sizes, 7.5)
    np.testing.assert_array_equal(kn, kp)
    assert list(kn) == [False, True, True]


def _feature(x, y, area):
    return {
        "type": "Feature",
        "id": f"{x}-{y}",
        "geometry": {"type": "Polygon", "coordinates": [[]]},
        "properties": {
            "measurements": [
                {"name": "area", "value": area},
                {"name": "perimeter", "value": 1.0},
                {"name": "centroidX", "value": x},
                {"name": "centroidY", "value": y},
            ]
        },
    }


def test_deduplicate_features_end_to_end():
    feats = [
        _feature(0.0, 0.0, 10.0),
        _feature(3.0, 0.0, 20.0),  # duplicate of the first, larger
        _feature(50.0, 50.0, 5.0),
    ]
    out = deduplicate(feats)
    assert len(out) == 2
    assert out[0]["id"] == "3.0-0.0"
    assert out[1]["id"] == "50.0-50.0"


def test_deduplicate_scan_fallback_layout():
    """Features with permuted measurement order still parse."""
    f = _feature(0.0, 0.0, 10.0)
    f["properties"]["measurements"] = list(
        reversed(f["properties"]["measurements"])
    )
    out = deduplicate([f, _feature(2.0, 0.0, 99.0)])
    assert len(out) == 1
    assert out[0]["id"] == "2.0-0.0"
