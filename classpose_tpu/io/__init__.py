"""Slide I/O: OpenSlide-compatible readers + host→device tile prefetch.

Reader protocol (reference L0, SURVEY §1): ``read_region(loc, level, size)``
→ PIL RGBA image in level-0 coordinates, ``level_dimensions``,
``level_downsamples``, ``level_count``, ``get_best_level_for_downsample``,
``get_thumbnail``, ``properties``, ``dimensions``, ``close``.
"""

from classpose_tpu.io.array_reader import ArraySlide, synthetic_wsi
from classpose_tpu.io.tiff_reader import TiffSlide
from classpose_tpu.io.prefetch import DevicePrefetcher

__all__ = ["ArraySlide", "synthetic_wsi", "TiffSlide", "DevicePrefetcher"]
