"""I/O tests: array reader, pure-python TIFF reader, prefetcher, facade."""

import os

import numpy as np
import pytest
from PIL import Image

from classpose_tpu.io import ArraySlide, TiffSlide, synthetic_wsi
from classpose_tpu.io.prefetch import DevicePrefetcher, TileReader
from classpose_tpu.utils import get_slide_resolution


def test_array_slide_interface():
    arr = np.arange(256 * 256 * 3, dtype=np.uint8).reshape(256, 256, 3)
    s = ArraySlide(arr, mpp=0.5)
    assert s.dimensions == (256, 256)
    assert s.level_downsamples[1] == 2.0
    r = np.asarray(s.read_region((10, 20), 0, (32, 16)))
    assert r.shape == (16, 32, 4)
    np.testing.assert_array_equal(r[..., :3], arr[20:36, 10:42])
    assert s.get_best_level_for_downsample(3.0) == 1
    assert get_slide_resolution(s) == (0.5, 0.5)
    # out-of-bounds read zero-padded
    r2 = np.asarray(s.read_region((250, 250), 0, (16, 16)))
    assert r2.shape == (16, 16, 4)
    assert (r2[8:, 8:, :3] == 0).all()


def test_synthetic_wsi_groundtruth():
    slide, gt = synthetic_wsi(width=1024, height=1024, n_cells=50, seed=1)
    assert len(gt) == 50
    img = np.asarray(slide.read_region((0, 0), 0, (1024, 1024)))[..., :3]
    cx, cy = gt[0]["center"]
    # nucleus darker than background at its center
    assert img[cy, cx].sum() < img[5, 5].sum()


def _write_pyramid_tiff(path, base, compression=None):
    imgs = [Image.fromarray(base)]
    lvl = base
    for _ in range(2):
        lvl = lvl[::2, ::2]
        imgs.append(Image.fromarray(lvl))
    kw = {"compression": compression} if compression else {}
    imgs[0].save(
        path, format="TIFF", save_all=True, append_images=imgs[1:],
        resolution=2.0, resolution_unit="cm", **kw,
    )


@pytest.mark.parametrize("compression", [None, "tiff_adobe_deflate", "tiff_lzw"])
def test_tiff_reader_pyramid(tmp_path, compression):
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, size=(300, 400, 3), dtype=np.uint8)
    path = str(tmp_path / f"test_{compression}.tif")
    _write_pyramid_tiff(path, base, compression)
    s = TiffSlide(path)
    assert s.level_count == 3
    assert s.dimensions == (400, 300)
    assert abs(s.level_downsamples[1] - 2.0) < 0.05
    r = np.asarray(s.read_region((50, 60), 0, (64, 32)))[..., :3]
    np.testing.assert_array_equal(r, base[60:92, 50:114])
    # level-1 read (level-0 coords!)
    r1 = np.asarray(s.read_region((100, 100), 1, (20, 20)))[..., :3]
    np.testing.assert_array_equal(r1, base[::2, ::2][50:70, 50:70])
    thumb = s.get_thumbnail((64, 64))
    assert max(thumb.size) <= 64
    # resolution tags: 2 px/cm → 5000 µm/px (nonsense but parses)
    assert get_slide_resolution(s) is not None
    s.close()


def test_tiff_reader_jpeg(tmp_path):
    rng = np.random.default_rng(1)
    base = rng.integers(100, 140, size=(128, 128, 3), dtype=np.uint8)
    path = str(tmp_path / "test_jpeg.tif")
    Image.fromarray(base).save(path, format="TIFF", compression="jpeg",
                               quality=95)
    s = TiffSlide(path)
    r = np.asarray(s.read_region((0, 0), 0, (128, 128)))[..., :3]
    assert r.shape == (128, 128, 3)
    assert np.abs(r.astype(int) - base.astype(int)).mean() < 6  # lossy
    s.close()


def test_wsi_reader_facade(monkeypatch, tmp_path):
    from classpose_tpu import get_wsi_reader

    monkeypatch.setenv("WSI_READER", "array")
    cls = get_wsi_reader()
    assert cls.__name__ == "ArraySlide"
    monkeypatch.setenv("WSI_READER", "tiff")
    assert get_wsi_reader().__name__ == "TiffSlide"
    monkeypatch.setenv("WSI_READER", "czi-zeiss")
    assert get_wsi_reader().__name__ == "CZISlide"
    monkeypatch.setenv("WSI_READER", "openslide")
    assert get_wsi_reader().__name__ in ("OpenSlide", "TiffSlide")


def test_tile_reader_and_prefetcher():
    slide, _ = synthetic_wsi(width=2048, height=1024, n_cells=20, seed=2)
    coords = [(x, y) for y in range(0, 1024, 512) for x in range(0, 2048, 512)]
    reader = TileReader(
        slide, coords, level=0, read_tile_size=(512, 512),
        resize_factor=0.5, n_threads=2,
    )
    tiles = list(reader)
    assert len(tiles) == len(coords)
    assert tiles[0][0].shape == (256, 256, 3)
    seen = {xy for _, xy in tiles}
    assert seen == set(coords)

    def batches():
        for tile, xy in tiles[:4]:
            yield tile[None].astype(np.float32), xy

    pf = DevicePrefetcher(batches(), depth=2)
    out = list(pf)
    assert len(out) == 4
    assert out[0][0].shape == (1, 256, 256, 3)


def test_prefetcher_propagates_errors():
    def bad():
        yield np.zeros((1, 4, 4, 3), np.float32), (0, 0)
        raise RuntimeError("decode failed")

    pf = DevicePrefetcher(bad(), depth=2)
    with pytest.raises(RuntimeError, match="decode failed"):
        list(pf)
