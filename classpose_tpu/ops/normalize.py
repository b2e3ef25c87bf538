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


def _tile_normalize(
    img: jnp.ndarray,
    ax: int,
    perc_low: float,
    perc_high: float,
    blocksize: int,
    invert: bool,
) -> jnp.ndarray:
    """Blockwise percentile normalization with bilinear stat interpolation."""
    # operate with channels last
    x = jnp.moveaxis(img, ax, -1)
    *lead, Ly, Lx, C = x.shape
    x2 = x.reshape((-1, Ly, Lx, C))
    ny = max(1, Ly // blocksize)
    nx = max(1, Lx // blocksize)
    blocksize = min(blocksize, Ly, Lx)
    ys = np.linspace(0, Ly - blocksize, ny).astype(int)
    xs = np.linspace(0, Lx - blocksize, nx).astype(int)
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
    # upsample block stats to full res (bilinear via jax.image)
    low_full = jax.image.resize(lows, (x2.shape[0], Ly, Lx, C), "linear")
    high_full = jax.image.resize(highs, (x2.shape[0], Ly, Lx, C), "linear")
    scale = jnp.maximum(high_full - low_full, 1e-3)
    out = (x2 - low_full) / scale
    if invert:
        out = 1.0 - out
    out = out.reshape((*lead, Ly, Lx, C))
    return jnp.moveaxis(out, -1, ax)
