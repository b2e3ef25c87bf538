"""Image normalization (cellpose ``transforms.normalize_img`` equivalent).

The reference normalizes every image/tile with 1st–99th percentile
per-channel rescaling before the net (models.py:642-666 via cellpose
``normalize_default``), with options for explicit low/high values, custom
percentiles, inversion, sharpening, and tiled normalization.

This implementation is pure JAX and jit-friendly for fixed shapes; it is
used both on-device inside the tile runner (so normalization fuses with the
host→HBM pipeline) and from numpy host code (jnp arrays accept numpy in).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

NORMALIZE_DEFAULT: dict[str, Any] = {
    "lowhigh": None,
    "percentile": None,
    "normalize": True,
    "norm3D": True,
    "sharpen_radius": 0,
    "smooth_radius": 0,
    "tile_norm_blocksize": 0,
    "tile_norm_smooth3D": 1,
    "invert": False,
    "percentile_subsample": 1,
}


def _gaussian_kernel1d(radius: int, sigma: float) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def _blur2d(img: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Separable gaussian blur over the last two axes (σ = radius/2)."""
    sigma = max(radius / 2.0, 0.5)
    k = _gaussian_kernel1d(radius, sigma)

    def conv_axis(a, axis):
        a = jnp.moveaxis(a, axis, -1)
        pad_width = [(0, 0)] * (a.ndim - 1) + [(radius, radius)]
        ap = jnp.pad(a, pad_width, mode="edge")
        out = jnp.zeros_like(a)
        for i in range(2 * radius + 1):
            out = out + k[i] * ap[..., i : i + a.shape[-1]]
        return jnp.moveaxis(out, -1, axis)

    return conv_axis(conv_axis(img, -2), -1)


def _integral_percentile(img: jnp.ndarray, qs: tuple[float, float],
                         reduce_axes: tuple[int, ...], ax: int):
    """EXACT per-channel percentiles for images whose float values are
    integers in [0, 255] (uint8 sources) via a 256-bin histogram — no 1M
    element sort. Matches jnp.percentile's linear interpolation bit-for-
    bit on such inputs: the k-th order statistic of discrete data is read
    off the cumulative histogram, and the (rank − k) interpolation weight
    is identical. Replaces the ~56 ms/batch sort in the fused device
    program (v5e trace, round 3)."""
    C = img.shape[ax]
    flat = jnp.moveaxis(img, ax, 0).reshape(C, -1)
    N = flat.shape[1]
    bins = jnp.arange(256, dtype=jnp.float32)
    counts = (flat[:, :, None] == bins[None, None, :]).sum(axis=1)
    cum = jnp.cumsum(counts, axis=1)  # (C, 256)

    def at_rank(rank: float):
        k = int(np.floor(rank))
        frac = jnp.float32(rank - k)
        # order statistic k = smallest bin with cum > k
        v_k = (cum <= k).sum(axis=1).astype(jnp.float32)
        v_k1 = (cum <= k + 1).sum(axis=1).astype(jnp.float32)
        return v_k + frac * (v_k1 - v_k)

    out = [at_rank(q / 100.0 * (N - 1)) for q in qs]
    shape = [1] * img.ndim
    shape[ax] = C
    return [o.reshape(shape) for o in out]


def normalize_img(
    img: jnp.ndarray,
    axis: int = -1,
    lowhigh: tuple[float, float] | None = None,
    percentile: tuple[float, float] | None = None,
    normalize: bool = True,
    invert: bool = False,
    sharpen_radius: int = 0,
    smooth_radius: int = 0,
    tile_norm_blocksize: int = 0,
    norm3D: bool = True,
    tile_norm_smooth3D: int = 1,
    percentile_subsample: int = 1,
    integral_stats: bool = False,
    **_ignored,
) -> jnp.ndarray:
    """Normalize so 0.0 ≈ 1st percentile and 1.0 ≈ 99th percentile per
    channel (channel axis ``axis``), matching cellpose semantics.

    ``lowhigh`` overrides percentiles; ``invert`` maps x → 1 − x (only valid
    with normalization); sharpen/smooth apply a difference-of-gaussians
    filter before normalization. ``tile_norm_blocksize`` > 0 normalizes in
    square blocks and linearly blends block statistics (approximation of
    cellpose's tiled normalization used for brightening dark slide areas).
    """
    img = jnp.asarray(img, jnp.float32)
    ax = axis % img.ndim
    if sharpen_radius > 0 or smooth_radius > 0:
        if sharpen_radius > 0:
            img = img - _blur2d(img, int(sharpen_radius))
        if smooth_radius > 0:
            img = _blur2d(img, int(smooth_radius))
    if not normalize:
        return img

    if lowhigh is not None:
        low, high = lowhigh
        img = (img - low) / max(high - low, 1e-6)
        if invert:
            img = 1.0 - img
        return img

    perc_low, perc_high = (1.0, 99.0) if percentile is None else percentile
    reduce_axes = tuple(i for i in range(img.ndim) if i != ax)

    if tile_norm_blocksize and tile_norm_blocksize > 0:
        return _tile_normalize(
            img, ax, perc_low, perc_high, int(tile_norm_blocksize), invert
        )

    if integral_stats:
        # uint8-sourced tiles: exact histogram percentiles, no sort
        x01, x99 = _integral_percentile(
            img, (perc_low, perc_high), reduce_axes, ax
        )
        scale = jnp.maximum(x99 - x01, 1e-3)
        out = (img - x01) / scale
        if invert:
            out = 1.0 - out
        return out

    stat_src = img
    if percentile_subsample > 1 and img.ndim >= 2:
        # estimate percentiles on a strided subsample — the sort dominates
        # normalization cost at production tile sizes, and 1st/99th
        # percentiles of natural tiles are insensitive to 2x striding
        d = int(percentile_subsample)
        sl = [slice(None)] * img.ndim
        for axis_i in range(img.ndim):
            if axis_i != ax:
                sl[axis_i] = slice(None, None, d)
        stat_src = img[tuple(sl)]
    x01 = jnp.percentile(stat_src, perc_low, axis=reduce_axes, keepdims=True)
    x99 = jnp.percentile(stat_src, perc_high, axis=reduce_axes, keepdims=True)
    scale = jnp.maximum(x99 - x01, 1e-3)
    out = (img - x01) / scale
    if invert:
        out = 1.0 - out
    return out


TILE_NORM_OVERLAP = 0.1  # cellpose tile_overlap for normalization blocks
TILE_NORM_SMOOTH_SIGMA = 1.0  # gaussian sigma over the block-stat grid
_SMOOTH_TRUNCATE = 4.0  # scipy.ndimage.gaussian_filter default


def tile_grid_starts(L: int, blocksize: int,
                     overlap: float = TILE_NORM_OVERLAP) -> np.ndarray:
    """Overlapping block starts for tiled normalization (cellpose
    normalize99_tile grid: ``ceil((1+2·overlap)·L/bs)`` blocks spread by
    linspace so neighbors overlap ~2·overlap·bs)."""
    if L <= blocksize:
        return np.zeros(1, int)
    n = int(np.ceil((1.0 + 2.0 * overlap) * L / blocksize))
    return np.linspace(0, L - blocksize, n).astype(int)


def _smooth_grid(g: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Gaussian smoothing of the (B, ny, nx, C) block-stat grid over the
    grid axes — scipy ``gaussian_filter(..., mode="reflect")`` semantics
    (truncate 4σ, symmetric edge padding)."""
    radius = int(_SMOOTH_TRUNCATE * sigma + 0.5)
    if radius < 1:
        return g
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / k.sum()

    def conv_axis(a, axis):
        n = a.shape[axis]
        if n == 1:
            return a
        a = jnp.moveaxis(a, axis, -1)
        # scipy mode="reflect" duplicates the edge sample = numpy
        # "symmetric"; pad width may exceed n, so chain pads
        pad = radius
        ap = a
        while pad > 0:
            p = min(pad, ap.shape[-1] - 1) if ap.shape[-1] > 1 else pad
            ap = jnp.pad(
                ap, [(0, 0)] * (ap.ndim - 1) + [(p, p)], mode="symmetric"
            )
            pad -= p
        out = jnp.zeros_like(a)
        for i in range(2 * radius + 1):
            out = out + k[i] * ap[..., i : i + n]
        return jnp.moveaxis(out, -1, axis)

    return conv_axis(conv_axis(g, 1), 2)


def _tile_normalize(
    img: jnp.ndarray,
    ax: int,
    perc_low: float,
    perc_high: float,
    blocksize: int,
    invert: bool,
) -> jnp.ndarray:
    """Smoothed blockwise percentile normalization (cellpose
    ``normalize99_tile`` semantics, used by the reference via
    ``transforms.normalize_img(tile_norm_blocksize=...)`` at
    models.py:642-666): overlapping blocks on a
    ``ceil(1.2·L/bs)``-linspace grid, per-block per-channel percentiles,
    gaussian smoothing (σ=1 grid cell) of the stat grids, bilinear
    (half-pixel) upsampling to full resolution, then
    ``(x − low) / max(high − low, eps)`` per pixel.

    cellpose itself is not importable in this environment, so the exact
    upstream constants could not be cross-checked against its source;
    the algorithm here is pinned by a numpy oracle
    (tests/test_ops.py::test_tile_norm_matches_numpy_oracle) and should
    be re-validated against real cellpose once network access exists
    (ROADMAP gap 8)."""
    # operate with channels last
    x = jnp.moveaxis(img, ax, -1)
    *lead, Ly, Lx, C = x.shape
    x2 = x.reshape((-1, Ly, Lx, C))
    blocksize = min(blocksize, Ly, Lx)
    ys = tile_grid_starts(Ly, blocksize)
    xs = tile_grid_starts(Lx, blocksize)
    ny, nx = len(ys), len(xs)
    lows = jnp.zeros((x2.shape[0], ny, nx, C))
    highs = jnp.zeros_like(lows)
    for j in range(ny):
        for i in range(nx):
            blk = x2[
                :, int(ys[j]) : int(ys[j]) + blocksize,
                int(xs[i]) : int(xs[i]) + blocksize, :,
            ]
            lows = lows.at[:, j, i].set(
                jnp.percentile(blk, perc_low, axis=(1, 2))
            )
            highs = highs.at[:, j, i].set(
                jnp.percentile(blk, perc_high, axis=(1, 2))
            )
    lows = _smooth_grid(lows, TILE_NORM_SMOOTH_SIGMA)
    highs = _smooth_grid(highs, TILE_NORM_SMOOTH_SIGMA)
    # upsample block stats to full res (bilinear, half-pixel centers —
    # cv2.resize INTER_LINEAR semantics)
    low_full = jax.image.resize(lows, (x2.shape[0], Ly, Lx, C), "linear")
    high_full = jax.image.resize(highs, (x2.shape[0], Ly, Lx, C), "linear")
    scale = jnp.maximum(high_full - low_full, 1e-3)
    out = (x2 - low_full) / scale
    if invert:
        out = 1.0 - out
    out = out.reshape((*lead, Ly, Lx, C))
    return jnp.moveaxis(out, -1, ax)
