"""On-demand-built native geometry core (see geomfast.cpp).

``load_geomfast()`` returns a ctypes handle to the compiled library, or
``None`` when native is disabled (CLASSPOSE_NATIVE_GEOM=0), the
toolchain is missing, or compilation fails — callers keep their
pure-numpy fallbacks. The build is a single g++ invocation cached next
to the source (rebuilt when the .cpp is newer), so the package needs no
build-system coupling and `pip install --no-build-isolation` stays
sufficient.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

from classpose_tpu.log import get_logger

logger = get_logger(__name__)

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "geomfast.cpp"
_SO = _HERE / "_geomfast.so"

_lib: "ctypes.CDLL | None | bool" = False  # False = not attempted yet


def _build() -> bool:
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", str(_SRC), "-o", str(_SO)
    ]
    try:
        r = subprocess.run(
            cmd, capture_output=True, text=True, timeout=120
        )
    except (OSError, subprocess.TimeoutExpired) as exc:
        logger.debug("geomfast build unavailable: %s", exc)
        return False
    if r.returncode != 0:
        logger.warning("geomfast build failed: %s", r.stderr[-500:])
        return False
    return True


def load_geomfast():
    """ctypes CDLL of the native geometry core, or None."""
    global _lib
    if _lib is not False:
        return _lib
    _lib = None
    if os.environ.get("CLASSPOSE_NATIVE_GEOM", "1") in ("0", "off"):
        return None
    try:
        if not _SO.exists() or (
            _SRC.exists()
            and _SO.stat().st_mtime < _SRC.stat().st_mtime
        ):
            if not _build():
                return None
        lib = ctypes.CDLL(str(_SO))
        lib.ring_simple.restype = ctypes.c_int
        lib.ring_simple.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_long
        ]
        lib.ring_metrics.restype = None
        lib.ring_metrics.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_long,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.points_in_ring.restype = None
        lib.points_in_ring.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_long,
            ctypes.POINTER(ctypes.c_double), ctypes.c_long,
            ctypes.POINTER(ctypes.c_ubyte),
        ]
        lib.class_vote.restype = None
        lib.class_vote.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int8),
            ctypes.c_long, ctypes.c_long, ctypes.POINTER(ctypes.c_int32),
        ]
        lib.rings_batch.restype = None
        lib.rings_batch.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_long),
            ctypes.c_long, ctypes.POINTER(ctypes.c_double),
        ]
        lib.fill_holes_relabel.restype = ctypes.c_long
        lib.fill_holes_relabel.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_long, ctypes.c_long,
            ctypes.c_long, ctypes.POINTER(ctypes.c_int32),
        ]
        lib.dedup_keep.restype = ctypes.c_long
        lib.dedup_keep.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.c_long,
            ctypes.c_double, ctypes.POINTER(ctypes.c_ubyte),
        ]
        lib.contours_batch.restype = ctypes.c_long
        lib.contours_batch.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_long, ctypes.c_long,
            ctypes.c_long, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_long),
        ]
        _lib = lib
    except OSError as exc:  # dlopen failure
        logger.debug("geomfast load failed: %s", exc)
        _lib = None
    return _lib
