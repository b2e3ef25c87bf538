"""Mesh setup and runtime configuration.

The TPU-native replacement for the reference's device bookkeeping
(distributed.py:93-136 + utils.get_device multi-GPU lists): devices form a
``jax.sharding.Mesh`` and parallelism is expressed with shardings, not
process pools.
"""

from __future__ import annotations

import os
from pathlib import Path

import jax
import numpy as np
from jax.sharding import Mesh

from classpose_tpu.log import get_logger

logger = get_logger(__name__)

_CACHE_ENABLED = False


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Enable JAX's persistent compilation cache.

    Cold XLA compiles of the full WSI pipeline take minutes on TPU; the
    persistent cache makes every run after the first start instantly.
    Controlled by ``CLASSPOSE_JAX_CACHE`` (set to ``0`` to disable).
    """
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return
    if os.getenv("CLASSPOSE_JAX_CACHE", "1") == "0":
        return
    cache_dir = cache_dir or os.getenv(
        "CLASSPOSE_JAX_CACHE_DIR",
        str(Path.home() / ".cache" / "classpose_tpu" / "jax"),
    )
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _CACHE_ENABLED = True
    logger.info("JAX persistent compilation cache at %s", cache_dir)


def local_device_count(platform: str | None = None) -> int:
    return len(jax.devices(platform) if platform else jax.devices())


def get_mesh(
    devices: list | None = None, axis_name: str = "tiles"
) -> Mesh:
    """Build a 1-D mesh over the given (or all local) devices — the
    tile-parallel axis replacing the reference's one-process-per-GPU
    workers (predict_wsi.py:1542-1572)."""
    devices = devices or jax.devices()
    return Mesh(np.array(devices), (axis_name,))
