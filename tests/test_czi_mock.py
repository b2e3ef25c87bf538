"""Execute CZISlide's own logic against a mock pylibCZIrw.

The real pylibCZIrw is absent in this environment (the gated
tests/test_czi_reader.py importorskips, like the reference's). These
tests instead install a numpy-backed fake whose API surface is the
subset THIS repo's reader uses (``CziReader.total_bounding_rectangle``
/ ``.metadata`` / ``.read(roi=..., zoom=...)`` — a real pylibCZIrw
surface, mirroring classpose_tpu/io/czi_reader.py's calls; the
reference's CZISlide at wsi_utils.py:10-143 instead consumes the
``total_bounding_box``/``total_bounding_box_no_pyramid`` dict form of
the same library), so the reader's OWN
semantics — nonzero bounding-box origin offsets, BGR→RGB channel
swap, meters→µm MPP resolution, edge-tile resize, pyramid level
math — are exercised rather than merely code-complete.
"""

import sys
import types

import numpy as np
import pytest


class _Rect:
    def __init__(self, x, y, w, h):
        self.x, self.y, self.w, self.h = x, y, w, h


class _FakeCziReader:
    """Serves zoomed ROI reads from a BGR numpy array at origin (x0, y0)."""

    def __init__(self, arr_bgr, x0=0, y0=0, mpp_um=None):
        self._arr = arr_bgr
        self._x0, self._y0 = x0, y0
        h, w = arr_bgr.shape[:2]
        self.total_bounding_rectangle = _Rect(x0, y0, w, h)
        self.metadata = {
            "ImageDocument": {
                "Metadata": {
                    "Scaling": {
                        "Items": {
                            "Distance": [
                                {"@Id": "X", "Value": mpp_um * 1e-6},
                                {"@Id": "Y", "Value": mpp_um * 1e-6},
                            ]
                        }
                    }
                }
            }
        } if mpp_um is not None else {}
        self.closed = False

    def read(self, roi, zoom):
        from PIL import Image

        x, y, w, h = roi
        # crop in document coords, clamped to the bounding rectangle —
        # real pylibCZIrw returns only covered pixels for edge ROIs
        xs, ys = x - self._x0, y - self._y0
        xe = min(xs + w, self._arr.shape[1])
        ye = min(ys + h, self._arr.shape[0])
        crop = self._arr[max(0, ys):ye, max(0, xs):xe]
        out_w = max(1, int(round(crop.shape[1] * zoom)))
        out_h = max(1, int(round(crop.shape[0] * zoom)))
        if (out_h, out_w) != crop.shape[:2]:
            img = Image.fromarray(crop)
            crop = np.asarray(img.resize((out_w, out_h), Image.NEAREST))
        return crop

    def close(self):
        self.closed = True


@pytest.fixture
def fake_pyczi(monkeypatch):
    czi_mod = types.ModuleType("pylibCZIrw.czi")
    pkg = types.ModuleType("pylibCZIrw")
    pkg.czi = czi_mod
    monkeypatch.setitem(sys.modules, "pylibCZIrw", pkg)
    monkeypatch.setitem(sys.modules, "pylibCZIrw.czi", czi_mod)
    return czi_mod


def _serve(fake_pyczi, reader):
    fake_pyczi.CziReader = lambda path: reader


def test_bgr_to_rgb_and_origin_offset(fake_pyczi):
    from classpose_tpu.io.czi_reader import CZISlide

    # constant BGR image: B=10, G=120, R=200, document origin (40, 24)
    arr = np.zeros((64, 96, 3), np.uint8)
    arr[..., 0], arr[..., 1], arr[..., 2] = 10, 120, 200
    reader = _FakeCziReader(arr, x0=40, y0=24, mpp_um=0.25)
    _serve(fake_pyczi, reader)

    slide = CZISlide("whatever.czi")
    assert slide.dimensions == (96, 64)
    assert float(slide.properties["openslide.mpp-x"]) == pytest.approx(0.25)

    region = np.asarray(slide.read_region((0, 0), 0, (32, 32)))
    assert region.shape == (32, 32, 4)
    # channel swap applied: RGB(A) out of a BGR source
    assert tuple(region[0, 0, :3]) == (200, 120, 10)
    slide.close()
    assert reader.closed


def test_edge_tile_is_resized_to_request(fake_pyczi):
    from classpose_tpu.io.czi_reader import CZISlide

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 255, (100, 80, 3), np.uint8)
    _serve(fake_pyczi, _FakeCziReader(arr))
    slide = CZISlide("x.czi")
    # 64×64 request whose ROI covers only 16 source columns: the fake
    # returns a 16-wide array and the reader must resize to the request
    region = slide.read_region((64, 0), 0, (64, 64))
    assert region.size == (64, 64)
    # no MPP metadata → property absent, no crash
    assert "openslide.mpp-x" not in slide.properties


def test_pyramid_levels_and_thumbnail(fake_pyczi):
    from classpose_tpu.io.czi_reader import CZISlide

    arr = np.full((256, 512, 3), 128, np.uint8)
    _serve(fake_pyczi, _FakeCziReader(arr, mpp_um=0.5))
    slide = CZISlide("x.czi")
    assert slide.level_count == 5
    assert slide.level_dimensions[0] == (512, 256)
    assert slide.level_dimensions[4] == (512 // 16, 256 // 16)
    # DELIBERATE divergence from the reference CZISlide: this reader
    # advertises the OpenSlide contract (largest level with downsample
    # <= requested → 2 for 5.0), while the reference's
    # get_best_level_for_downsample (wsi_utils.py:121-134) returns the
    # first level with downsample >= requested (3 for 5.0). The
    # pipeline's level/MPP math assumes OpenSlide semantics for every
    # reader behind the WSI_READER facade.
    assert slide.get_best_level_for_downsample(5.0) == 2
    assert slide.get_best_level_for_downsample(16.0) == 4
    # level-1 read: zoom 0.5 through the fake, full size honored
    region = np.asarray(slide.read_region((0, 0), 1, (64, 64)))
    assert region.shape == (64, 64, 4)
    thumb = slide.get_thumbnail((64, 64))
    assert max(thumb.size) <= 64
