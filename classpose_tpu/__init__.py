"""classpose_tpu — TPU-native whole-slide-image cell phenotyping framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of sohmandal/classpose:
Cellpose-SAM-style ViT-L flow-field instance segmentation with a semantic
classification head, a production WSI inference pipeline, GrandQC tissue and
artefact QC, a multi-task training stack, PQ evaluation metrics, and
GeoJSON/CSV/SpatialData export — preserving the ``classpose-predict-wsi``
CLI / QuPath-extension contract.

The ``WSI_READER`` env var selects the slide reader backend, mirroring the
reference facade (/root/reference/src/classpose/__init__.py:9-41).
"""

from __future__ import annotations

import os

__version__ = "0.1.0"


def get_wsi_reader():
    """Return the slide reader class selected by the ``WSI_READER`` env var.

    Parity with reference __init__.py:9-36: default is the OpenSlide-style
    pyramid reader; ``czi-zeiss`` selects the CZI (JPEG-XR) reader. The TPU
    build adds ``tiff`` (pure-Python tiled TIFF/SVS reader used when the
    openslide native library is unavailable) and ``array`` (in-memory reader
    for tests/benchmarks).
    """
    reader = os.getenv("WSI_READER", "openslide").lower()
    if reader in ("czi-zeiss", "czi"):
        from classpose_tpu.io.czi_reader import CZISlide

        return CZISlide
    if reader == "array":
        from classpose_tpu.io.array_reader import ArraySlide

        return ArraySlide
    if reader == "tiff":
        from classpose_tpu.io.tiff_reader import TiffSlide

        return TiffSlide
    # openslide default, with pure-python TIFF fallback
    try:
        from openslide import OpenSlide  # type: ignore

        return OpenSlide
    except ImportError:
        from classpose_tpu.io.tiff_reader import TiffSlide

        return TiffSlide


class _WSIReaderMeta(type):
    def __call__(cls, *args, **kwargs):
        return get_wsi_reader()(*args, **kwargs)


class WSIReader(metaclass=_WSIReaderMeta):
    """Facade: ``WSIReader(path)`` instantiates the env-selected backend
    (reference __init__.py:39-41)."""
