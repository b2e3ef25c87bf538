"""Tiled inference runner: the JAX equivalents of the reference's
core.run_net (core.py:75-231) and ClassposeModel.eval (models.py:478-827)."""

from classpose_tpu.runner.core import run_net, TileRunner
from classpose_tpu.runner.model import ClassposeModel, compute_class_masks

__all__ = ["run_net", "TileRunner", "ClassposeModel", "compute_class_masks"]
