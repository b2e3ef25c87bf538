"""HED stain-space color augmentation.

Capability parity with the reference ``HEDTransform``
(transforms/hed.py:136-313): deconvolve RGB into the Ruifrok H/E/DAB
optical-density space, apply per-stain random multiplicative (sigma) and
additive (bias) perturbations in ±``magnitude`` (default 0.25), reconvolve,
and skip the transform for patches whose mean intensity indicates
background. Inputs with negative values (already-normalized images) are
shifted into a positive range and shifted back, as the reference does.

Images are (C, H, W) float arrays; any intensity scale is accepted (uint8
ranges are normalized internally).
"""

from __future__ import annotations

import numpy as np

from classpose_tpu.pipeline.tile_filter import HED_FROM_RGB, RGB_FROM_HED


class HEDTransform:
    def __init__(
        self,
        magnitude: float = 0.25,
        p: float = 1.0,
        cutoff_range: tuple[float, float] = (0.15, 0.85),
        seed=None,
    ):
        self.magnitude = magnitude
        self.p = p
        self.cutoff_range = cutoff_range
        self.rng = np.random.default_rng(seed)

    def transform(self, img: np.ndarray) -> np.ndarray:
        if self.rng.random() > self.p:
            return img
        img = np.asarray(img, np.float32)
        chw = img.ndim == 3 and img.shape[0] in (1, 3)
        rgb = np.moveaxis(img, 0, -1) if chw else img

        # shift negatives (cellpose-normalized inputs) into positive range
        shift = min(0.0, float(rgb.min()))
        rgb_pos = rgb - shift
        scale = float(rgb_pos.max())
        if scale <= 0:
            return img
        unit = np.clip(rgb_pos / scale, 1e-6, 1.0)

        mean_intensity = float(unit.mean())
        lo, hi = self.cutoff_range
        if not (lo <= mean_intensity <= hi):
            return img

        od = (np.log(unit) / np.log(1e-6)) @ HED_FROM_RGB
        sigma = self.rng.uniform(-self.magnitude, self.magnitude, size=3)
        bias = self.rng.uniform(-self.magnitude, self.magnitude, size=3)
        od = od * (1.0 + sigma) + bias
        rgb_new = np.power(1e-6, od @ RGB_FROM_HED)
        rgb_new = np.clip(rgb_new, 0, 1) * scale + shift
        out = rgb_new.astype(np.float32)
        return np.moveaxis(out, -1, 0) if chw else out

    __call__ = transform
