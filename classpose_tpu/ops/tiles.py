"""Overlapping-tile extraction and smooth-window overlap averaging.

TPU-first rebuild of the cellpose tiling primitives the reference leans on at
core.py:130-231 (``transforms.get_pad_yx`` / ``make_tiles`` /
``average_tiles`` / ``unaugment_tiles``) and the class-aware TTA unaugment
(/root/reference/src/classpose/transforms/transforms.py:4-21).

Design: the tile grid is computed *statically* (python ints) from the image
shape, so the extract → forward → average pipeline is fully jittable with
static shapes — one XLA program per (image size, bsize, overlap, augment)
combination. Tiles are gathered with static slices and blended back with a
sigmoid taper window via scatter-add; XLA fuses the unrolled slice loop.

Conventions (identical to the reference):
- non-augmented grid: n = 1 if L <= bsize else ceil((1 + 2·overlap)·L/bsize),
  tile starts = round(linspace(0, L − bsize, n));
- TTA ("augment") grid: n = max(2, ceil(2·L/bsize)) with the parity flip
  pattern of cellpose make_tiles: (j even, i odd) → flip axis −2,
  (j odd, i even) → flip axis −1, (j odd, i odd) → flip both. Flow channels
  are sign-corrected on unaugment (channel 0 with axis −2, channel 1 with
  axis −1); class channels are only un-flipped.
- taper window: radial-separable sigmoid 1/(1+exp((|x−c|−(bsize/2−20))/σ)),
  σ=7.5 — matches cellpose's _taper_mask used by average_tiles.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np


def get_pad_yx(
    Ly: int, Lx: int, min_size: tuple[int, int]
) -> tuple[int, int, int, int]:
    """Symmetric padding so each dim is at least ``min_size`` (cellpose
    ``transforms.get_pad_yx`` as used at reference core.py:130-133)."""
    ypad = max(0, min_size[0] - Ly)
    xpad = max(0, min_size[1] - Lx)
    ypad1, xpad1 = ypad // 2, xpad // 2
    return ypad1, ypad - ypad1, xpad1, xpad - xpad1


@dataclasses.dataclass(frozen=True)
class TileGrid:
    """Static description of an overlapping tile grid over (Ly, Lx)."""

    Ly: int
    Lx: int
    bsize: int
    ny: int
    nx: int
    ystart: tuple[int, ...]
    xstart: tuple[int, ...]
    augment: bool

    @property
    def ntiles(self) -> int:
        return self.ny * self.nx


def _starts(L: int, bsize: int, n: int) -> tuple[int, ...]:
    if n == 1:
        return (0,)
    return tuple(
        int(round(v)) for v in np.linspace(0, max(0, L - bsize), n)
    )


def compute_tile_grid(
    Ly: int,
    Lx: int,
    bsize: int = 256,
    tile_overlap: float = 0.1,
    augment: bool = False,
) -> TileGrid:
    """Compute the static tile grid (reference core.py:136-149 semantics)."""
    if augment:
        ny = max(2, int(math.ceil(2.0 * Ly / bsize)))
        nx = max(2, int(math.ceil(2.0 * Lx / bsize)))
    else:
        ny = 1 if Ly <= bsize else int(
            math.ceil((1.0 + 2 * tile_overlap) * Ly / bsize)
        )
        nx = 1 if Lx <= bsize else int(
            math.ceil((1.0 + 2 * tile_overlap) * Lx / bsize)
        )
    return TileGrid(
        Ly=Ly,
        Lx=Lx,
        bsize=bsize,
        ny=ny,
        nx=nx,
        ystart=_starts(Ly, bsize, ny),
        xstart=_starts(Lx, bsize, nx),
        augment=augment,
    )


def _flip_for_parity(tile: jnp.ndarray, j: int, i: int) -> jnp.ndarray:
    """Apply the cellpose TTA flip pattern to one (C, by, bx) tile."""
    if j % 2 == 0 and i % 2 == 1:
        return tile[:, ::-1, :]
    if j % 2 == 1 and i % 2 == 0:
        return tile[:, :, ::-1]
    if j % 2 == 1 and i % 2 == 1:
        return tile[:, ::-1, ::-1]
    return tile


def make_tiles(img: jnp.ndarray, grid: TileGrid) -> jnp.ndarray:
    """Extract (ntiles, C, bsize, bsize) from a (C, Ly, Lx) image.

    Static slicing; with ``grid.augment`` the parity flip pattern is applied
    so TTA averaging sees consistently oriented predictions after
    :func:`unaugment_tiles`.
    """
    b = grid.bsize
    tiles = []
    for j, ys in enumerate(grid.ystart):
        for i, xs in enumerate(grid.xstart):
            t = img[:, ys : ys + b, xs : xs + b]
            if grid.augment:
                t = _flip_for_parity(t, j, i)
            tiles.append(t)
    return jnp.stack(tiles, axis=0)


def unaugment_tiles(y: jnp.ndarray, grid: TileGrid) -> jnp.ndarray:
    """Undo TTA flips on flow predictions (ntiles, 3, by, bx): flips are
    reversed and flow components sign-corrected (cellpose unaugment_tiles,
    used at reference core.py:207-210)."""
    out = []
    k = 0
    for j in range(grid.ny):
        for i in range(grid.nx):
            t = _flip_for_parity(y[k], j, i)
            if j % 2 == 0 and i % 2 == 1:
                t = t.at[0].multiply(-1)
            elif j % 2 == 1 and i % 2 == 0:
                t = t.at[1].multiply(-1)
            elif j % 2 == 1 and i % 2 == 1:
                t = t.at[0].multiply(-1)
                t = t.at[1].multiply(-1)
            out.append(t)
            k += 1
    return jnp.stack(out, axis=0)


def unaugment_class_tiles(y: jnp.ndarray, grid: TileGrid) -> jnp.ndarray:
    """Undo TTA flips on class predictions without flow sign correction
    (reference transforms/transforms.py:4-21)."""
    out = []
    k = 0
    for j in range(grid.ny):
        for i in range(grid.nx):
            out.append(_flip_for_parity(y[k], j, i))
            k += 1
    return jnp.stack(out, axis=0)


def taper_mask(bsize: int = 256, sig: float = 7.5) -> np.ndarray:
    """Separable sigmoid taper window used for overlap blending."""
    xm = np.arange(bsize, dtype=np.float32)
    xm = np.abs(xm - xm.mean())
    mask = 1.0 / (1.0 + np.exp((xm - (bsize / 2 - 20)) / sig))
    return (mask[:, None] * mask[None, :]).astype(np.float32)


def average_tiles(
    y: jnp.ndarray, grid: TileGrid, eps: float = 1e-12
) -> jnp.ndarray:
    """Blend (ntiles, C, bsize, bsize) predictions into (C, Ly, Lx) with the
    taper window (cellpose average_tiles, reference core.py:215-221).

    The accumulation runs in the input dtype (bf16 in production) — each
    unrolled tile update round-trips the full output buffer through HBM, so
    halving the element size halves the dominant traffic; the final
    normalization is fp32."""
    b = grid.bsize
    acc_t = y.dtype if y.dtype == jnp.bfloat16 else jnp.float32
    mask = jnp.asarray(taper_mask(b)).astype(acc_t)
    yf = jnp.zeros((y.shape[1], grid.Ly, grid.Lx), acc_t)
    navg = jnp.zeros((grid.Ly, grid.Lx), jnp.float32)
    k = 0
    for ys in grid.ystart:
        for xs in grid.xstart:
            yf = yf.at[:, ys : ys + b, xs : xs + b].add(
                y[k].astype(acc_t) * mask
            )
            navg = navg.at[ys : ys + b, xs : xs + b].add(
                mask.astype(jnp.float32)
            )
            k += 1
    return yf.astype(jnp.float32) / (navg + eps)


def _blend_1d(pieces: list, starts: tuple[int, ...], bsize: int, L: int,
              axis: int, mask1d: jnp.ndarray, eps: float = 1e-12):
    """Blend equal-size slabs along ``axis`` into length ``L`` by
    concatenating exclusive segments and pairwise-overlap weighted sums.

    Requires every point to be covered by at most two slabs (true for the
    production tile_overlap=0.1 grids; the TTA half-overlap grid uses the
    scatter-add path instead). Traffic is O(output) instead of
    O(n_slabs × output)."""
    n = len(pieces)
    if n == 1:
        return pieces[0]

    def seg(piece, lo, hi):
        idx = [slice(None)] * piece.ndim
        idx[axis] = slice(lo, hi)
        return piece[tuple(idx)]

    def wseg(i, j, lo, hi):
        # weighted average of slabs i (ending) and j (starting) over the
        # global interval [lo, hi)
        wi = mask1d[lo - starts[i] : hi - starts[i]]
        wj = mask1d[lo - starts[j] : hi - starts[j]]
        shape = [1] * pieces[0].ndim
        shape[axis] = hi - lo
        wi = wi.reshape(shape)
        wj = wj.reshape(shape)
        a = seg(pieces[i], lo - starts[i], hi - starts[i])
        b = seg(pieces[j], lo - starts[j], hi - starts[j])
        return (a * wi + b * wj) / (wi + wj + eps)

    out = []
    cursor = 0
    for i in range(n):
        end_i = starts[i] + bsize
        nxt = starts[i + 1] if i + 1 < n else L
        # exclusive part of slab i
        excl_hi = min(end_i, nxt)
        if excl_hi > cursor:
            out.append(seg(pieces[i], cursor - starts[i],
                           excl_hi - starts[i]))
            cursor = excl_hi
        # overlap with slab i+1
        if i + 1 < n and end_i > nxt:
            out.append(wseg(i, i + 1, nxt, end_i))
            cursor = end_i
    return jnp.concatenate(out, axis=axis)


def average_tiles_separable(
    y: jnp.ndarray, grid: TileGrid, eps: float = 1e-12
) -> jnp.ndarray:
    """Exact equivalent of :func:`average_tiles` for grids where at most
    two tiles overlap per axis (tile_overlap < 0.5, non-TTA): a separable
    concat-based two-pass blend with O(output) HBM traffic instead of the
    unrolled scatter-add chain.

    Falls back to :func:`average_tiles` when the grid violates the
    pairwise-overlap precondition.
    """
    b = grid.bsize

    def pairwise_ok(starts):
        return all(
            starts[i + 2] >= starts[i] + b
            for i in range(len(starts) - 2)
        )

    if grid.augment or not pairwise_ok(grid.ystart) \
            or not pairwise_ok(grid.xstart):
        return average_tiles(y, grid, eps)

    acc_t = y.dtype if y.dtype == jnp.bfloat16 else jnp.float32
    # separable windows: taper_mask = m1d[:, None] * m1d[None, :]
    xm = np.arange(b, dtype=np.float32)
    xm = np.abs(xm - xm.mean())
    m1d = jnp.asarray(
        (1.0 / (1.0 + np.exp((xm - (b / 2 - 20)) / 7.5))).astype(np.float32)
    ).astype(acc_t)

    ny, nx = grid.ny, grid.nx
    yv = y.astype(acc_t).reshape((ny, nx) + y.shape[1:])
    # pass 1: blend along x within each tile row (weights = m1d on axis -1)
    rows = []
    for j in range(ny):
        pieces = [yv[j, i] for i in range(nx)]
        rows.append(
            _blend_1d(pieces, grid.xstart, b, grid.Lx, axis=-1,
                      mask1d=m1d, eps=eps)
        )
    # pass 2: blend rows along y (weights = m1d on axis -2)
    out = _blend_1d(rows, grid.ystart, b, grid.Ly, axis=-2, mask1d=m1d,
                    eps=eps)
    return out.astype(jnp.float32)
