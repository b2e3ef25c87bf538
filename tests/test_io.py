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


def _write_minimal_bigtiff(path, img):
    """Hand-craft a little-endian BigTIFF with one uncompressed strip."""
    import struct

    H, W, _ = img.shape
    data = img.tobytes()
    header = struct.pack("<2sHHHQ", b"II", 43, 8, 0, 16)
    # IFD at offset 16
    entries = []

    def entry(tag, type_, count, value):
        return struct.pack("<HHQQ", tag, type_, count, value)

    data_offset = 16 + 8 + 11 * 20 + 8  # after IFD
    bps_offset = data_offset + len(data)
    entries.append(entry(256, 4, 1, W))            # ImageWidth
    entries.append(entry(257, 4, 1, H))            # ImageLength
    entries.append(entry(258, 3, 3, 0))            # BitsPerSample → offset
    entries.append(entry(259, 3, 1, 1))            # Compression none
    entries.append(entry(262, 3, 1, 2))            # Photometric RGB
    entries.append(entry(273, 16, 1, data_offset))  # StripOffsets
    entries.append(entry(277, 3, 1, 3))            # SamplesPerPixel
    entries.append(entry(278, 4, 1, H))            # RowsPerStrip
    entries.append(entry(279, 16, 1, len(data)))   # StripByteCounts
    entries.append(entry(282, 3, 1, 72))           # XResolution (short ok)
    entries.append(entry(296, 3, 1, 2))            # ResolutionUnit inch
    # patch BitsPerSample offset entry now that bps_offset is known
    entries[2] = entry(258, 3, 3, bps_offset)
    ifd = struct.pack("<Q", len(entries)) + b"".join(entries) + \
        struct.pack("<Q", 0)
    with open(path, "wb") as f:
        f.write(header)
        f.write(ifd)
        assert f.tell() == data_offset, (f.tell(), data_offset)
        f.write(data)
        f.write(struct.pack("<HHH", 8, 8, 8))


def test_bigtiff_reader(tmp_path):
    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (60, 80, 3), dtype=np.uint8).astype(np.uint8)
    path = str(tmp_path / "big.tif")
    _write_minimal_bigtiff(path, img)
    s = TiffSlide(path)
    assert s.dimensions == (80, 60)
    r = np.asarray(s.read_region((10, 5), 0, (32, 16)))[..., :3]
    np.testing.assert_array_equal(r, img[5:21, 10:42])
    s.close()


def test_download_if_unavailable(tmp_path, monkeypatch):
    from classpose_tpu import utils

    payload = b"slide-bytes" * 100

    class FakeResp:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def raise_for_status(self):
            pass

        def iter_content(self, chunk_size):
            yield payload

    import types, sys

    fake_requests = types.SimpleNamespace(
        get=lambda url, stream, timeout: FakeResp()
    )
    monkeypatch.setitem(sys.modules, "requests", fake_requests)

    dest = tmp_path / "dl" / "slide.svs"
    out = utils.download_if_unavailable(str(dest), "https://x/slide.svs")
    assert dest.read_bytes() == payload
    # idempotent: second call does not re-download
    fake_requests.get = lambda *a, **k: (_ for _ in ()).throw(
        AssertionError("should not re-download")
    )
    assert utils.download_if_unavailable(str(dest), "https://x/s") == str(dest)
    # insecure http refused without the env gate
    with pytest.raises(ValueError, match="Refusing insecure"):
        utils.download_if_unavailable(
            str(tmp_path / "other.svs"), "http://x/slide.svs"
        )


def test_tiff_writer_reader_roundtrip(tmp_path):
    """The tiled-JPEG BigTIFF pyramid writer must round-trip through the
    first-party reader: level geometry, MPP from the Aperio-style
    description, and pixel content to JPEG tolerance."""
    import cv2

    from classpose_tpu.io.tiff_reader import TiffSlide
    from classpose_tpu.io.tiff_writer import write_tiled_tiff

    rng = np.random.default_rng(0)
    img = cv2.GaussianBlur(
        rng.integers(0, 255, size=(700, 1100, 3), dtype=np.uint8),
        (0, 0), 4,
    )
    path = write_tiled_tiff(tmp_path / "pyr.tiff", img, tile=256,
                            quality=92, mpp=0.5)
    s = TiffSlide(str(path))
    assert s.level_count == 2
    assert s.level_dimensions[0] == (1100, 700)
    assert s.level_dimensions[1] == (550, 350)
    assert float(s.properties["openslide.mpp-x"]) == 0.5
    r = np.asarray(
        s.read_region((300, 100), 0, (256, 200)).convert("RGB")
    )
    ref = img[100:300, 300:556]
    assert np.abs(r.astype(int) - ref.astype(int)).mean() < 2.0
    # unaligned read across tile boundaries at level 1
    r1 = np.asarray(s.read_region((90, 70), 1, (300, 128)).convert("RGB"))
    ref1 = img[::2, ::2][35:163, 45:345]
    assert np.abs(r1.astype(int) - ref1.astype(int)).mean() < 6.0
    s.close()
