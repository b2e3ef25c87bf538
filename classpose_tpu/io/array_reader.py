"""In-memory OpenSlide-compatible reader + synthetic H&E WSI generator.

``ArraySlide`` wraps a level-0 RGB numpy array as a pyramid slide — the
test/bench backend (``WSI_READER=array``), standing in for network-fetched
openslide test data the reference integration tests download
(tests/test_prediction_integration.py:22-34 in the reference).

``synthetic_wsi`` draws elliptical "cells" of several classes on a pinkish
background and returns the image together with per-cell ground truth, so
integration tests can assert detection/classification end-to-end without
any downloads.
"""

from __future__ import annotations

import numpy as np
from PIL import Image


class ArraySlide:
    """OpenSlide-compatible facade over a numpy (H, W, 3) uint8 array."""

    def __init__(self, array, mpp: float = 0.25, n_levels: int = 4,
                 properties: dict | None = None):
        if isinstance(array, str):
            # path to a .npy file (so WSIReader(path) keeps working)
            array = np.load(array)
        self._level0 = np.asarray(array, np.uint8)
        H, W = self._level0.shape[:2]
        self.level_count = n_levels
        self.level_downsamples = tuple(float(2**i) for i in range(n_levels))
        self.level_dimensions = tuple(
            (max(1, W // 2**i), max(1, H // 2**i)) for i in range(n_levels)
        )
        self.dimensions = self.level_dimensions[0]
        self.properties = {
            "openslide.mpp-x": str(mpp),
            "openslide.mpp-y": str(mpp),
            **(properties or {}),
        }
        self._levels = [self._level0]
        for i in range(1, n_levels):
            self._levels.append(self._levels[-1][::2, ::2])

    def read_region(self, location, level, size) -> Image.Image:
        x0, y0 = location  # level-0 coordinates (openslide contract)
        w, h = size
        ds = int(self.level_downsamples[level])
        lx, ly = x0 // ds, y0 // ds
        arr = self._levels[level]
        out = np.zeros((h, w, 4), np.uint8)
        ys, xs = max(0, ly), max(0, lx)
        ye = min(arr.shape[0], ly + h)
        xe = min(arr.shape[1], lx + w)
        if ye > ys and xe > xs:
            sub = arr[ys:ye, xs:xe]
            out[ys - ly : ys - ly + sub.shape[0],
                xs - lx : xs - lx + sub.shape[1], :3] = sub
            out[ys - ly : ys - ly + sub.shape[0],
                xs - lx : xs - lx + sub.shape[1], 3] = 255
        return Image.fromarray(out, "RGBA")

    def get_best_level_for_downsample(self, downsample: float) -> int:
        best = 0
        for i, ds in enumerate(self.level_downsamples):
            if ds <= downsample + 1e-9:
                best = i
        return best

    def get_thumbnail(self, size) -> Image.Image:
        img = Image.fromarray(self._levels[-1])
        img.thumbnail(size)
        return img.convert("RGB")

    def close(self):
        pass


def synthetic_wsi(
    width: int = 4096,
    height: int = 4096,
    n_cells: int = 400,
    n_classes: int = 3,
    cell_radius: tuple[int, int] = (8, 16),
    mpp: float = 0.25,
    seed: int = 0,
):
    """Generate a synthetic H&E-like slide with elliptical nuclei.

    Returns ``(ArraySlide, gt)`` where gt is a list of dicts
    {center (x, y), radius, class_id (1-based)}.
    """
    import cv2

    rng = np.random.default_rng(seed)
    img = np.full((height, width, 3), 0, np.uint8)
    # eosin-ish background with mild texture
    img[..., 0] = 235
    img[..., 1] = 205
    img[..., 2] = 225
    if height * width <= 1 << 30:
        noise = rng.normal(0, 4, size=(height, width, 1))
        img = np.clip(img.astype(np.int16) + noise, 0, 255).astype(np.uint8)
    else:
        # giant slides (64k²: the float64 noise plane alone would be
        # 34 GB): add the texture in row blocks. Different RNG draw
        # order than the one-shot path, so the ≤1 Gpx branch keeps
        # small fixtures byte-identical across versions.
        for y0 in range(0, height, 4096):
            y1 = min(y0 + 4096, height)
            blk = img[y0:y1].astype(np.int16) + rng.normal(
                0, 4, size=(y1 - y0, width, 1)
            )
            img[y0:y1] = np.clip(blk, 0, 255).astype(np.uint8)

    class_colors = [
        (90, 60, 140),   # dark purple nuclei
        (60, 90, 160),   # bluish
        (120, 70, 100),  # reddish-purple
        (70, 120, 110),
        (140, 100, 60),
    ]
    gt = []
    occupancy = np.zeros((height, width), bool)
    attempts = 0
    while len(gt) < n_cells and attempts < n_cells * 20:
        attempts += 1
        r = int(rng.integers(cell_radius[0], cell_radius[1] + 1))
        cx = int(rng.integers(r + 2, width - r - 2))
        cy = int(rng.integers(r + 2, height - r - 2))
        y0, y1 = cy - r - 2, cy + r + 3
        x0, x1 = cx - r - 2, cx + r + 3
        if occupancy[y0:y1, x0:x1].any():
            continue
        cls = int(rng.integers(1, n_classes + 1))
        color = class_colors[(cls - 1) % len(class_colors)]
        ax = (int(r * rng.uniform(0.8, 1.0)), int(r * rng.uniform(0.8, 1.0)))
        ang = float(rng.uniform(0, 180))
        cv2.ellipse(img, (cx, cy), ax, ang, 0, 360, color, -1,
                    lineType=cv2.LINE_AA)
        occupancy[y0:y1, x0:x1] = True
        gt.append(
            {"center": (cx, cy), "radius": r, "class_id": cls}
        )
    return ArraySlide(img, mpp=mpp), gt
