"""Image-quality augmentations.

Parity with reference transforms/image_quality.py:16-281: Gaussian blur
(p=0.1, σ∈[0,2]), additive Gaussian noise (p=0.8, σ=0.01 of the value
range), and hue/brightness/saturation jitter (p=0.9) — reimplemented on
cv2/numpy instead of torchvision.
"""

from __future__ import annotations

import numpy as np


class _Base:
    def __init__(self, p: float, seed=None):
        self.p = p
        self.rng = np.random.default_rng(seed)

    def _roll(self) -> bool:
        return self.rng.random() < self.p

    def __call__(self, img):
        return self.transform(img)


def _to_hwc(img):
    img = np.asarray(img, np.float32)
    chw = img.ndim == 3 and img.shape[0] in (1, 3)
    return (np.moveaxis(img, 0, -1) if chw else img), chw


def _from_hwc(img, chw):
    return np.moveaxis(img, -1, 0).astype(np.float32) if chw else \
        img.astype(np.float32)


class GaussianBlurTransform(_Base):
    def __init__(self, p: float = 0.1, sigma_range=(0.0, 2.0), seed=None):
        super().__init__(p, seed)
        self.sigma_range = sigma_range

    def transform(self, img):
        if not self._roll():
            return img
        import cv2

        sigma = float(self.rng.uniform(*self.sigma_range))
        if sigma <= 0:
            return img
        hwc, chw = _to_hwc(img)
        out = cv2.GaussianBlur(hwc, (0, 0), sigmaX=sigma, sigmaY=sigma)
        if out.ndim == 2:
            out = out[..., None]
        return _from_hwc(out, chw)


class AdditiveNoiseTransform(_Base):
    def __init__(self, p: float = 0.8, sigma: float = 0.01, seed=None):
        super().__init__(p, seed)
        self.sigma = sigma

    def transform(self, img):
        if not self._roll():
            return img
        img = np.asarray(img, np.float32)
        span = max(float(img.max() - img.min()), 1e-6)
        return img + self.rng.normal(
            0, self.sigma * span, img.shape
        ).astype(np.float32)


class HueBrightnessSaturationTransform(_Base):
    def __init__(
        self,
        p: float = 0.9,
        hue: float = 0.1,
        brightness: float = 0.1,
        saturation: float = 0.1,
        seed=None,
    ):
        super().__init__(p, seed)
        self.hue = hue
        self.brightness = brightness
        self.saturation = saturation

    def transform(self, img):
        if not self._roll():
            return img
        import cv2

        hwc, chw = _to_hwc(img)
        if hwc.shape[-1] != 3:
            return img
        shift = min(0.0, float(hwc.min()))
        span = max(float(hwc.max() - shift), 1e-6)
        unit = np.clip((hwc - shift) / span, 0, 1)
        hsv = cv2.cvtColor(unit, cv2.COLOR_RGB2HSV)
        dh = self.rng.uniform(-self.hue, self.hue) * 360.0
        db = 1 + self.rng.uniform(-self.brightness, self.brightness)
        dsat = 1 + self.rng.uniform(-self.saturation, self.saturation)
        hsv[..., 0] = (hsv[..., 0] + dh) % 360.0
        hsv[..., 1] = np.clip(hsv[..., 1] * dsat, 0, 1)
        hsv[..., 2] = np.clip(hsv[..., 2] * db, 0, 1)
        out = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB) * span + shift
        return _from_hwc(out, chw)


class ImageQualityAugmentation:
    """Blur + noise + HBS chained (reference image_quality.py pipeline)."""

    def __init__(self, blur_p=0.1, noise_p=0.8, hbs_p=0.9, seed=None):
        rng = np.random.default_rng(seed)
        self.transforms = [
            GaussianBlurTransform(blur_p, seed=rng.integers(2**31)),
            AdditiveNoiseTransform(noise_p, seed=rng.integers(2**31)),
            HueBrightnessSaturationTransform(hbs_p,
                                             seed=rng.integers(2**31)),
        ]

    def transform(self, img):
        for t in self.transforms:
            img = t.transform(img)
        return img

    __call__ = transform
