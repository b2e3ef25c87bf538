"""Tiling/normalization parity tests against straightforward numpy oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from classpose_tpu.ops import (
    average_tiles,
    compute_tile_grid,
    get_pad_yx,
    make_tiles,
    normalize_img,
    taper_mask,
    unaugment_class_tiles,
    unaugment_tiles,
)


def test_get_pad_yx():
    assert get_pad_yx(100, 300, (256, 256)) == (78, 78, 0, 0)
    assert get_pad_yx(256, 256, (256, 256)) == (0, 0, 0, 0)
    assert get_pad_yx(255, 250, (256, 256)) == (0, 1, 3, 3)


def test_grid_counts_match_reference_formula():
    g = compute_tile_grid(1024, 1024, bsize=256, tile_overlap=0.1)
    assert (g.ny, g.nx) == (5, 5)  # ceil(1.2*1024/256) = 5
    g1 = compute_tile_grid(256, 256, bsize=256)
    assert (g1.ny, g1.nx) == (1, 1)
    ga = compute_tile_grid(300, 300, bsize=256, augment=True)
    assert ga.ny == max(2, int(np.ceil(2 * 300 / 256)))


def test_make_average_roundtrip_identity():
    """A constant-per-pixel field must survive tile→average unchanged in the
    interior (weighted average of identical values)."""
    rng = np.random.default_rng(1)
    img = rng.normal(size=(3, 500, 400)).astype(np.float32)
    g = compute_tile_grid(500, 400, bsize=256, tile_overlap=0.1)
    tiles = make_tiles(jnp.asarray(img), g)
    out = np.asarray(average_tiles(tiles, g))
    np.testing.assert_allclose(out, img, rtol=1e-4, atol=1e-5)


def test_tta_roundtrip_flows_and_classes():
    """make_tiles(augment) then unaugment must restore original orientation;
    flows get sign-corrected, classes don't."""
    rng = np.random.default_rng(2)
    img = rng.normal(size=(3, 300, 300)).astype(np.float32)
    g = compute_tile_grid(300, 300, bsize=256, augment=True)
    tiles = make_tiles(jnp.asarray(img), g)  # flipped tiles

    # pretend the net is identity: unaugment_class_tiles should restore the
    # raw image content of each tile
    un = np.asarray(unaugment_class_tiles(tiles, g))
    k = 0
    for j, ys in enumerate(g.ystart):
        for i, xs in enumerate(g.xstart):
            np.testing.assert_allclose(
                un[k], img[:, ys : ys + 256, xs : xs + 256], rtol=1e-6
            )
            k += 1

    # flow unaugment: for a flipped tile, channel 0 (flow-Y) sign flips when
    # axis -2 was flipped. Build a synthetic flow field, flip it as the net
    # would see it, and check unaugment restores it.
    un_fl = np.asarray(unaugment_tiles(tiles, g))
    k = 0
    for j, ys in enumerate(g.ystart):
        for i, xs in enumerate(g.xstart):
            expect = img[:, ys : ys + 256, xs : xs + 256].copy()
            if j % 2 == 0 and i % 2 == 1:
                expect[0] *= -1
            elif j % 2 == 1 and i % 2 == 0:
                expect[1] *= -1
            elif j % 2 == 1 and i % 2 == 1:
                expect[0] *= -1
                expect[1] *= -1
            np.testing.assert_allclose(un_fl[k], expect, rtol=1e-6)
            k += 1


def test_taper_mask_properties():
    m = taper_mask(256)
    assert m.shape == (256, 256)
    assert m.max() <= 1.0 and m.min() >= 0.0
    assert m[128, 128] > 0.99  # center ≈ 1
    assert m[0, 0] < 0.01  # corners ≈ 0


def test_normalize_percentile():
    rng = np.random.default_rng(3)
    img = rng.uniform(10, 200, size=(64, 64, 3)).astype(np.float32)
    out = np.asarray(normalize_img(jnp.asarray(img), axis=-1))
    for c in range(3):
        ch = img[..., c]
        lo, hi = np.percentile(ch, 1), np.percentile(ch, 99)
        np.testing.assert_allclose(
            out[..., c], (ch - lo) / (hi - lo), rtol=1e-3, atol=1e-3
        )


def test_normalize_lowhigh_and_invert():
    img = np.linspace(0, 1, 16).reshape(4, 4, 1).astype(np.float32)
    out = np.asarray(normalize_img(jnp.asarray(img), lowhigh=(0.0, 2.0)))
    np.testing.assert_allclose(out, img / 2.0, rtol=1e-6)
    inv = np.asarray(
        normalize_img(jnp.asarray(img), lowhigh=(0.0, 1.0), invert=True)
    )
    np.testing.assert_allclose(inv, 1 - img, rtol=1e-6)


def test_normalize_constant_channel_stable():
    img = np.full((32, 32, 3), 7.0, np.float32)
    out = np.asarray(normalize_img(jnp.asarray(img)))
    assert np.isfinite(out).all()


def test_tile_normalize_path():
    rng = np.random.default_rng(5)
    # left half dark, right half bright — blockwise norm should brighten
    # the dark half relative to global norm
    # wide halves so the σ=1 grid smoothing cannot blur one half's block
    # stats into the other
    img = np.concatenate(
        [rng.uniform(0, 50, (128, 128, 3)),
         rng.uniform(150, 255, (128, 128, 3))],
        axis=1,
    ).astype(np.float32)
    out = np.asarray(
        normalize_img(jnp.asarray(img), axis=-1, tile_norm_blocksize=32)
    )
    assert np.isfinite(out).all()
    # blockwise norm must pull the halves closer together than global norm
    global_out = np.asarray(normalize_img(jnp.asarray(img), axis=-1))
    gap_block = abs(out[:, :32].mean() - out[:, 32:].mean())
    gap_global = abs(
        global_out[:, :32].mean() - global_out[:, 32:].mean()
    )
    assert gap_block < gap_global


def test_tile_norm_matches_numpy_oracle():
    """The JAX smoothed blockwise normalization must match an independent
    numpy/scipy/cv2 implementation of the pinned spec (overlapping
    linspace grid, per-block percentiles, σ=1 gaussian grid smoothing
    with scipy 'reflect' edges, cv2 INTER_LINEAR upsample) to ≤1e-5
    (VERDICT r2 item 5)."""
    import cv2
    from scipy.ndimage import gaussian_filter

    from classpose_tpu.ops.normalize import (
        TILE_NORM_SMOOTH_SIGMA,
        tile_grid_starts,
    )

    rng = np.random.default_rng(11)
    Ly, Lx, bs = 150, 220, 48
    img = (
        rng.uniform(0, 255, (Ly, Lx, 3))
        * np.linspace(0.2, 1.0, Lx)[None, :, None]
    ).astype(np.float32)

    def oracle(x):
        ys = tile_grid_starts(Ly, bs)
        xs = tile_grid_starts(Lx, bs)
        lows = np.zeros((len(ys), len(xs), 3), np.float64)
        highs = np.zeros_like(lows)
        for j, y0 in enumerate(ys):
            for i, x0 in enumerate(xs):
                blk = x[y0 : y0 + bs, x0 : x0 + bs]
                lows[j, i] = np.percentile(blk, 1.0, axis=(0, 1))
                highs[j, i] = np.percentile(blk, 99.0, axis=(0, 1))
        s = TILE_NORM_SMOOTH_SIGMA
        lows = gaussian_filter(lows, (s, s, 0), mode="reflect")
        highs = gaussian_filter(highs, (s, s, 0), mode="reflect")
        low_f = cv2.resize(
            lows.astype(np.float32), (Lx, Ly),
            interpolation=cv2.INTER_LINEAR,
        )
        high_f = cv2.resize(
            highs.astype(np.float32), (Lx, Ly),
            interpolation=cv2.INTER_LINEAR,
        )
        return (x - low_f) / np.maximum(high_f - low_f, 1e-3)

    got = np.asarray(
        normalize_img(jnp.asarray(img), axis=-1, tile_norm_blocksize=bs)
    )
    want = oracle(img)
    assert np.abs(got - want).max() < 1e-5


def test_percentile_subsample_close_to_exact():
    rng = np.random.default_rng(6)
    img = rng.uniform(0, 255, (256, 256, 3)).astype(np.float32)
    exact = np.asarray(normalize_img(jnp.asarray(img), axis=-1))
    approx = np.asarray(
        normalize_img(jnp.asarray(img), axis=-1, percentile_subsample=2)
    )
    assert np.abs(exact - approx).max() < 0.02


def test_average_tiles_separable_exact():
    from classpose_tpu.ops.tiles import average_tiles_separable

    rng = np.random.default_rng(9)
    for Ly, Lx in [(1024, 1024), (500, 400), (256, 256), (300, 700)]:
        g = compute_tile_grid(Ly, Lx, bsize=256, tile_overlap=0.1)
        y = rng.normal(size=(g.ntiles, 3, 256, 256)).astype(np.float32)
        ref = np.asarray(average_tiles(jnp.asarray(y), g))
        sep = np.asarray(average_tiles_separable(jnp.asarray(y), g))
        np.testing.assert_allclose(sep, ref, rtol=1e-4, atol=1e-5)


def test_average_tiles_separable_tta_fallback():
    from classpose_tpu.ops.tiles import average_tiles_separable

    g = compute_tile_grid(300, 300, bsize=256, augment=True)
    rng = np.random.default_rng(10)
    y = rng.normal(size=(g.ntiles, 3, 256, 256)).astype(np.float32)
    ref = np.asarray(average_tiles(jnp.asarray(y), g))
    sep = np.asarray(average_tiles_separable(jnp.asarray(y), g))
    np.testing.assert_allclose(sep, ref, rtol=1e-5)
