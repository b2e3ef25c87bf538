"""CZI reader tests (gated on pylibCZIrw, like the reference's
tests/test_czi_reader.py which importorskips it)."""

import numpy as np
import pytest

pytest.importorskip("pylibCZIrw")


def test_czi_slide_interface(tmp_path):
    """Write a small CZI via pylibCZIrw and read it back through CZISlide."""
    from pylibCZIrw import czi as pyczi

    from classpose_tpu.io.czi_reader import CZISlide

    path = str(tmp_path / "test.czi")
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (512, 768, 3), np.uint8)
    with pyczi.create_czi(path) as w:
        w.write(data=img, plane={"C": 0})

    slide = CZISlide(path)
    assert slide.level_count == 5
    assert slide.level_downsamples == (1.0, 2.0, 4.0, 8.0, 16.0)
    assert slide.dimensions[0] >= 768 - 1
    region = np.asarray(slide.read_region((0, 0), 0, (128, 128)))
    assert region.shape == (128, 128, 4)
    thumb = slide.get_thumbnail((64, 64))
    assert max(thumb.size) <= 64
    assert slide.get_best_level_for_downsample(5.0) == 2
    slide.close()


def test_facade_selects_czi(monkeypatch):
    from classpose_tpu import get_wsi_reader

    monkeypatch.setenv("WSI_READER", "czi-zeiss")
    assert get_wsi_reader().__name__ == "CZISlide"
