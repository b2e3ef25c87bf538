"""Rank-aware logging utilities.

Mirrors the behavior of the reference logging subsystem
(/root/reference/src/classpose/log.py:12-53): per-module loggers, console
output, an optional file handler controlled by ``CLASSPOSE_LOG_PATH``, and a
lower default verbosity on non-main processes (``LOG_LEVEL_NON_MAIN``).

TPU-native difference: "rank" is derived from ``jax.process_index()`` when a
multi-process JAX runtime is initialized, falling back to the ``RANK`` env var
(so host-side multiprocessing workers can also mark themselves non-main).
"""

from __future__ import annotations

import logging
import os
import sys

_FORMAT = "%(asctime)s [%(levelname)s] %(name)s: %(message)s"
_FILE_PATH_ENV = "CLASSPOSE_LOG_PATH"


def _process_rank() -> int:
    rank = os.getenv("RANK")
    if rank is not None:
        try:
            return int(rank)
        except ValueError:
            return 0
    try:  # pragma: no cover - only in initialized multiprocess runtimes
        import sys

        jax = sys.modules.get("jax")
        if jax is None:
            return 0
        # never initialize the XLA backend from a logger: that would break
        # jax.distributed.initialize ordering for any module-level logger
        from jax._src import xla_bridge

        if not xla_bridge.backends_are_initialized():
            return 0
        return jax.process_index()
    except Exception:
        return 0


def _default_level() -> int:
    if _process_rank() > 0:
        name = os.getenv("LOG_LEVEL_NON_MAIN", "WARNING")
    else:
        name = os.getenv("LOG_LEVEL", "INFO")
    return getattr(logging, name.upper(), logging.INFO)


def get_logger(name: str) -> logging.Logger:
    """Create (or fetch) a configured per-module logger."""
    logger = logging.getLogger(name)
    if getattr(logger, "_classpose_configured", False):
        return logger
    logger.setLevel(_default_level())
    handler = logging.StreamHandler(sys.stdout)
    handler.setFormatter(logging.Formatter(_FORMAT))
    logger.addHandler(handler)
    file_path = os.getenv(_FILE_PATH_ENV)
    if file_path:
        fh = logging.FileHandler(file_path)
        fh.setFormatter(logging.Formatter(_FORMAT))
        logger.addHandler(fh)
    logger.propagate = False
    logger._classpose_configured = True  # type: ignore[attr-defined]
    return logger


def add_file_handler(logger: logging.Logger, path: str) -> None:
    """Attach an extra file handler (used by training runs on the main rank,
    as the reference does at train.py:424-425)."""
    fh = logging.FileHandler(path)
    fh.setFormatter(logging.Formatter(_FORMAT))
    logger.addHandler(fh)
