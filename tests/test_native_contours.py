"""Native batch contour extraction vs the cv2 per-instance loop.

The geomfast ``contours_batch`` kernel replaces the PostProcessor's
per-instance ``cv2.findContours(crop == id, RETR_EXTERNAL,
CHAIN_APPROX_SIMPLE)[0]`` loop (reference predict_wsi.py:578-656) with one
Suzuki-Abe pass over the label image. These tests pin vertex-exact parity
on connected instances — random blobs, thin structures, touching
instances, image-border cells — and feature-level parity of
``process_tile`` between the native and fallback paths.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from classpose_tpu.native import load_geomfast
from classpose_tpu.pipeline.postprocess import (
    _contours_batch_native,
    process_tile,
)

pytestmark = pytest.mark.skipif(
    load_geomfast() is None, reason="native geomfast unavailable"
)


def cv2_reference_contour(masks: np.ndarray, idx: int) -> np.ndarray:
    """The reference's exact per-instance contour (tile coordinates)."""
    from scipy import ndimage

    sl = ndimage.find_objects(masks)[idx - 1]
    y_slice, x_slice = sl
    cell_mask = masks[y_slice, x_slice] == idx
    contours = cv2.findContours(
        cell_mask.astype(np.uint8),
        cv2.RETR_EXTERNAL,
        cv2.CHAIN_APPROX_SIMPLE,
    )[0]
    return contours[0][:, 0] + np.array([x_slice.start, y_slice.start])


def random_blob_labels(rng, H=96, W=96, n=12) -> np.ndarray:
    """Disjoint random blobs: dilated random walks, later ids win."""
    masks = np.zeros((H, W), np.int32)
    for i in range(1, n + 1):
        y, x = rng.integers(4, H - 4), rng.integers(4, W - 4)
        for _ in range(rng.integers(3, 40)):
            masks[max(y - 1, 0) : y + 2, max(x - 1, 0) : x + 2] = i
            y = int(np.clip(y + rng.integers(-2, 3), 1, H - 2))
            x = int(np.clip(x + rng.integers(-2, 3), 1, W - 2))
    # connected-component guarantee: keep each id's largest component
    out = np.zeros_like(masks)
    nid = 0
    for i in range(1, n + 1):
        comp = cv2.connectedComponents(
            (masks == i).astype(np.uint8), connectivity=8
        )[1]
        vals, counts = np.unique(comp[comp > 0], return_counts=True)
        if len(vals) == 0:
            continue
        nid += 1
        out[comp == vals[np.argmax(counts)]] = nid
    return out


@pytest.mark.parametrize("seed", range(8))
def test_random_blobs_vertex_exact(seed):
    rng = np.random.default_rng(seed)
    masks = random_blob_labels(rng)
    nat = _contours_batch_native(masks)
    assert nat is not None
    pts, offs, ids, fpx = nat
    present = np.unique(masks[masks > 0])
    assert list(ids) == list(present)
    for k, idx in enumerate(ids):
        ring = pts[offs[k] : offs[k + 1]]
        ref = cv2_reference_contour(masks, int(idx))
        np.testing.assert_array_equal(
            ring, ref, err_msg=f"instance {idx} seed {seed}"
        )
        # class-lookup pixel: raster-first in-mask pixel
        flat = np.flatnonzero(masks.ravel() == idx)[0]
        assert fpx[k] == flat


@pytest.mark.parametrize(
    "shape",
    [
        # single pixel, domino, L, diagonal chain, ring-with-hole, full row
        [(5, 5)],
        [(5, 5), (5, 6)],
        [(5, 5), (6, 5), (6, 6)],
        [(2, 2), (3, 3), (4, 4), (5, 5)],
        [(y, x) for y in range(2, 7) for x in range(2, 7)
         if not (3 <= y <= 5 and 3 <= x <= 5)] + [(9, 9)],
        [(0, x) for x in range(12)],
    ],
)
def test_structured_shapes_vertex_exact(shape):
    masks = np.zeros((12, 12), np.int32)
    for y, x in shape:
        masks[y, x] = 1
    nat = _contours_batch_native(masks)
    pts, offs, ids, fpx = nat
    assert len(ids) == 1
    ref = cv2_reference_contour(masks, 1)
    np.testing.assert_array_equal(pts[offs[0] : offs[1]], ref)


def test_disconnected_instance_matches_cv2_order():
    """cv2 returns EXTERNAL contours in reverse discovery order, so a
    disconnected instance's contours[0] is the raster-LAST component —
    the native pass must pick the same one."""
    masks = np.zeros((16, 16), np.int32)
    masks[2:5, 2:5] = 1   # first component (larger)
    masks[10, 10] = 1     # later, raster-last component
    masks[12:14, 1:4] = 1  # even later
    pts, offs, ids, fpx = _contours_batch_native(masks)
    assert list(ids) == [1]
    ref = cv2_reference_contour(masks, 1)
    np.testing.assert_array_equal(pts[offs[0] : offs[1]], ref)
    # class-lookup pixel stays the WHOLE instance's first pixel
    assert fpx[0] == 2 * 16 + 2


def test_border_touching_and_touching_instances():
    masks = np.zeros((20, 20), np.int32)
    masks[0:4, 0:4] = 1          # corner
    masks[16:20, 10:20] = 2      # bottom edge
    masks[8:12, 0:3] = 3         # left edge
    masks[5:9, 8:12] = 4
    masks[5:9, 12:16] = 5        # touches 4
    nat = _contours_batch_native(masks)
    pts, offs, ids, fpx = nat
    for k, idx in enumerate(ids):
        ref = cv2_reference_contour(masks, int(idx))
        np.testing.assert_array_equal(
            pts[offs[k] : offs[k + 1]], ref, err_msg=f"instance {idx}"
        )


def test_absent_ids_skipped():
    masks = np.zeros((10, 10), np.int32)
    masks[2:4, 2:4] = 1
    masks[6:8, 6:8] = 5  # gap: ids 2..4 absent
    pts, offs, ids, fpx = _contours_batch_native(masks)
    assert list(ids) == [1, 5]


def test_capacity_retry():
    """A vertex count past the initial capacity must grow transparently
    (80x4096 canvas → initial cap 40960 vertices; the 1023-stripe comb
    needs ~4 vertices each but the canvas floor keeps cap modest while
    the comb exercises many-instance bookkeeping; correctness is pinned
    against cv2 at three probes)."""
    import classpose_tpu.pipeline.postprocess as pp

    big = np.zeros((80, 4096), np.int32)
    # a comb of 1-px vertical stripes: worst-case vertices per area
    for i in range(1, 1024):
        big[10:70, 4 * i] = i
    pts, offs, ids, fpx = pp._contours_batch_native(big)
    assert len(ids) == 1023
    for k in (0, 511, 1022):
        ref = cv2_reference_contour(big, int(ids[k]))
        np.testing.assert_array_equal(pts[offs[k] : offs[k + 1]], ref)


def test_process_tile_native_matches_fallback(monkeypatch):
    rng = np.random.default_rng(11)
    masks = random_blob_labels(rng, H=128, W=128, n=25)
    cls = rng.integers(1, 5, size=masks.shape).astype(np.int32)
    labels = ["a", "b", "c", "d"]
    cells_nat, inv_nat = process_tile(
        masks, cls, (100.0, 200.0), 2.0, labels
    )
    monkeypatch.setenv("CLASSPOSE_NATIVE_GEOM", "0")
    import classpose_tpu.native as nat_mod

    monkeypatch.setattr(nat_mod, "_lib", None)
    cells_fb, inv_fb = process_tile(
        masks, cls, (100.0, 200.0), 2.0, labels
    )
    monkeypatch.setattr(nat_mod, "_lib", False)  # restore lazy reload
    assert inv_nat == inv_fb
    assert len(cells_nat) == len(cells_fb)
    for a, b in zip(cells_nat, cells_fb):
        assert a["coords"] == b["coords"]
        assert a["class_int"] == b["class_int"]
        assert a["label"] == b["label"]
        # metric backends differ (native rings_batch vs numpy fallback);
        # same rings, float-summation-order tolerance only
        assert a["area"] == pytest.approx(b["area"], rel=1e-12)
        assert a["perimeter"] == pytest.approx(b["perimeter"], rel=1e-12)
        assert a["centroid"] == b["centroid"]  # rounded to 2dp
