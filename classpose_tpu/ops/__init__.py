"""Pure-JAX image ops: tile extraction/averaging, TTA flips, normalization."""

from classpose_tpu.ops.tiles import (
    TileGrid,
    get_pad_yx,
    compute_tile_grid,
    make_tiles,
    average_tiles,
    taper_mask,
    unaugment_tiles,
    unaugment_class_tiles,
)
from classpose_tpu.ops.normalize import normalize_img, NORMALIZE_DEFAULT

__all__ = [
    "TileGrid",
    "get_pad_yx",
    "compute_tile_grid",
    "make_tiles",
    "average_tiles",
    "taper_mask",
    "unaugment_tiles",
    "unaugment_class_tiles",
    "normalize_img",
    "NORMALIZE_DEFAULT",
]
