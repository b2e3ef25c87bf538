"""Tiled network runner.

Functional equivalent of the reference ``run_net`` (core.py:75-231): pad the
image to ≥ bsize, extract overlapping bsize² tiles (TTA flip grid when
``augment``), forward through the net in batches, undo TTA, blend overlaps
with the taper window, and crop the padding. The class channels are split
from the seg channels exactly as the reference ``_forward`` does
(core.py:51-72).

TPU design: for a fixed image size the entire pad→tile→forward→blend→crop
pipeline is one jitted XLA program (`TileRunner`), so tile extraction and
blending fuse with the network forward and no host round-trips occur. The
batch dimension over net tiles is folded into the forward; the runner pads
the tile count to a multiple of the batch size and scans over chunks with
``lax.map`` to bound peak memory.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from classpose_tpu.ops.tiles import (
    average_tiles_separable as average_tiles,
    compute_tile_grid,
    get_pad_yx,
    make_tiles,
    unaugment_class_tiles,
    unaugment_tiles,
)


def chunk_plan(nt: int, batch_size: int) -> tuple[int, int, int]:
    """(nchunk, bs, pad_tiles) for scanning ``nt`` tiles in chunks of at
    most ``batch_size``. The per-chunk batch is shrunk to the smallest
    value that keeps the same chunk count, minimizing padded (wasted)
    forwards: nt=25 with batch_size=8 gives 4 chunks of 7 (3 padded)
    instead of 4 chunks of 8 (7 padded — a 22% overhead on the grid
    forward)."""
    nchunk = int(np.ceil(nt / min(batch_size, nt)))
    bs = int(np.ceil(nt / nchunk))
    return nchunk, bs, nchunk * bs - nt


class TileRunner:
    """Compiled tiled-forward for one (Ly, Lx) image geometry.

    ``apply_fn(x_nchw) -> (y_nchw, style)`` is the network apply with bound
    params; ``n_cell_classes`` controls the class/seg channel split.
    """

    def __init__(
        self,
        apply_fn,
        n_cell_classes: int,
        bsize: int = 256,
        batch_size: int = 8,
        tile_overlap: float = 0.1,
        augment: bool = False,
    ):
        self.apply_fn = apply_fn
        self.n_cell_classes = int(n_cell_classes or 1)
        self.bsize = bsize
        self.batch_size = batch_size
        self.tile_overlap = tile_overlap
        self.augment = augment
        self._compiled: dict = {}

    def _build(self, Ly: int, Lx: int):
        ypad1, ypad2, xpad1, xpad2 = get_pad_yx(
            Ly, Lx, (self.bsize, self.bsize)
        )
        Lyp, Lxp = Ly + ypad1 + ypad2, Lx + xpad1 + xpad2
        grid = compute_tile_grid(
            Lyp, Lxp, self.bsize, self.tile_overlap, self.augment
        )
        nt = grid.ntiles
        nchunk, bs, pad_tiles = chunk_plan(nt, self.batch_size)
        ncls = self.n_cell_classes

        def run(img_chw):
            img_chw = jnp.pad(
                img_chw, ((0, 0), (ypad1, ypad2), (xpad1, xpad2))
            )
            tiles = make_tiles(img_chw, grid)  # (nt, C, b, b)
            if pad_tiles:
                tiles = jnp.concatenate(
                    [tiles, jnp.zeros((pad_tiles,) + tiles.shape[1:],
                                      tiles.dtype)]
                )
            chunks = tiles.reshape((nchunk, bs) + tiles.shape[1:])

            def fwd(chunk):
                # keep the network dtype (bf16 in production) through
                # unaugment/blending — the blend is HBM-bound
                y, style = self.apply_fn(chunk)
                return y, style.astype(jnp.float32)

            y, styles = jax.lax.map(fwd, chunks)
            y = y.reshape((nchunk * bs,) + y.shape[2:])[:nt]
            styles = styles.reshape((nchunk * bs, -1))[:nt]

            if ncls > 1:
                y_class, y_seg = y[:, :ncls], y[:, ncls:]
            else:
                y_class, y_seg = None, y

            if self.augment:
                y_seg = unaugment_tiles(y_seg, grid)
                if y_class is not None:
                    y_class = unaugment_class_tiles(y_class, grid)

            yf = average_tiles(y_seg, grid)[
                :, ypad1 : ypad1 + Ly, xpad1 : xpad1 + Lx
            ]
            out = {"y": yf}
            if y_class is not None:
                out["y_class"] = average_tiles(y_class, grid)[
                    :, ypad1 : ypad1 + Ly, xpad1 : xpad1 + Lx
                ]
            style = styles.sum(axis=0)
            norm = jnp.sqrt(jnp.sum(style**2))
            out["style"] = jnp.where(norm > 0, style / norm, style)
            return out

        return jax.jit(run)

    def __call__(self, img_chw: jnp.ndarray):
        """img (C, Ly, Lx) → dict(y=(3, Ly, Lx), y_class=(ncls, Ly, Lx)?,
        style=(256,))."""
        key = (img_chw.shape[1], img_chw.shape[2])
        if key not in self._compiled:
            self._compiled[key] = self._build(*key)
        return self._compiled[key](img_chw)


def run_net(
    apply_fn,
    imgi: np.ndarray,
    n_cell_classes: int = 1,
    batch_size: int = 8,
    augment: bool = False,
    tile_overlap: float = 0.1,
    bsize: int = 256,
):
    """Run the network on a stack of images (reference core.py:75-231).

    Args:
        apply_fn: jittable ``x (B, C, b, b) -> (y, style)``.
        imgi: (nimg, Ly, Lx, nchan) float array.

    Returns ``(yf, y_classf, styles)`` with yf (nimg, Ly, Lx, 3),
    y_classf (nimg, Ly, Lx, ncls) or None, styles (nimg, 256) — the
    reference's channel-last return layout.
    """
    nimg, Ly, Lx, nchan = imgi.shape
    runner = TileRunner(
        apply_fn,
        n_cell_classes,
        bsize=bsize,
        batch_size=batch_size,
        tile_overlap=tile_overlap,
        augment=augment,
    )
    yf = np.zeros((nimg, Ly, Lx, 3), np.float32)
    y_classf = (
        np.zeros((nimg, Ly, Lx, n_cell_classes), np.float32)
        if n_cell_classes and n_cell_classes > 1
        else None
    )
    styles = np.zeros((nimg, 256), np.float32)
    for i in range(nimg):
        out = runner(jnp.asarray(imgi[i].transpose(2, 0, 1)))
        yf[i] = np.asarray(out["y"]).transpose(1, 2, 0)
        if y_classf is not None:
            y_classf[i] = np.asarray(out["y_class"]).transpose(1, 2, 0)
        styles[i] = np.asarray(out["style"])
    return yf, y_classf, styles
