"""Zeiss CZI (JPEG-XR) reader with an OpenSlide-like interface.

Behavioral parity with the reference ``CZISlide``
(/root/reference/src/classpose/wsi_utils.py:10-143): synthesizes a 5-level
pyramid with downsamples [1, 2, 4, 8, 16] over pylibCZIrw's arbitrary-zoom
reads, resolves MPP from CZI metadata (meters → µm), converts BGR→RGB, and
resizes edge tiles to the requested size. Gated on the optional pylibCZIrw
dependency (``WSI_READER=czi-zeiss``), exactly as the reference gates it.
"""

from __future__ import annotations

import numpy as np
from PIL import Image

from classpose_tpu.log import get_logger

logger = get_logger(__name__)

_DOWNSAMPLES = (1, 2, 4, 8, 16)


class CZISlide:
    def __init__(self, path: str):
        try:
            from pylibCZIrw import czi as pyczi
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "pylibCZIrw is required for WSI_READER=czi-zeiss; install "
                "the 'czi' extra."
            ) from e
        self._reader = pyczi.CziReader(path)
        bbox = self._reader.total_bounding_rectangle
        self._x0, self._y0 = int(bbox.x), int(bbox.y)
        W, H = int(bbox.w), int(bbox.h)
        self.level_count = len(_DOWNSAMPLES)
        self.level_downsamples = tuple(float(d) for d in _DOWNSAMPLES)
        self.level_dimensions = tuple(
            (max(1, W // d), max(1, H // d)) for d in _DOWNSAMPLES
        )
        self.dimensions = self.level_dimensions[0]
        self.properties = {}
        mpp = self._resolve_mpp()
        if mpp:
            self.properties["openslide.mpp-x"] = str(mpp)
            self.properties["openslide.mpp-y"] = str(mpp)

    def _resolve_mpp(self) -> float | None:
        try:
            md = self._reader.metadata
            scaling = (
                md["ImageDocument"]["Metadata"]["Scaling"]["Items"]["Distance"]
            )
            if isinstance(scaling, dict):
                scaling = [scaling]
            for item in scaling:
                if item.get("@Id") in ("X", "x"):
                    return float(item["Value"]) * 1e6  # meters → µm
        except (KeyError, TypeError, ValueError):
            logger.warning("could not resolve MPP from CZI metadata")
        return None

    def read_region(self, location, level, size) -> Image.Image:
        x0, y0 = location  # level-0 coords
        w, h = size
        ds = int(self.level_downsamples[level])
        roi = (
            self._x0 + int(x0),
            self._y0 + int(y0),
            int(w * ds),
            int(h * ds),
        )
        arr = self._reader.read(roi=roi, zoom=1.0 / ds)
        arr = np.asarray(arr)
        if arr.ndim == 3 and arr.shape[2] >= 3:
            arr = arr[..., [2, 1, 0]]  # BGR → RGB
        img = Image.fromarray(arr.astype(np.uint8)).convert("RGBA")
        if img.size != (w, h):
            img = img.resize((w, h))
        return img

    def get_best_level_for_downsample(self, downsample: float) -> int:
        best = 0
        for i, ds in enumerate(self.level_downsamples):
            if ds <= downsample + 1e-9:
                best = i
        return best

    def get_thumbnail(self, size) -> Image.Image:
        lv = self.level_count - 1
        w, h = self.level_dimensions[lv]
        img = self.read_region((0, 0), lv, (w, h)).convert("RGB")
        img.thumbnail(size)
        return img

    def close(self):
        self._reader.close()
