"""Histology augmentation tests: value ranges, shape preservation,
probability gating, and the pipeline manager."""

import numpy as np
import pytest

from classpose_tpu.transforms import (
    AUGMENTATION_CONFIGS,
    AdditiveNoiseTransform,
    GaussianBlurTransform,
    HEDTransform,
    HEStainingTransform,
    HueBrightnessSaturationTransform,
    StarDistAugmentation,
    create_stardist_augmentation,
    get_config,
)


def he_like_image(seed=0, chw=True):
    rng = np.random.default_rng(seed)
    img = np.full((96, 96, 3), [225, 195, 215], np.float32)
    yy, xx = np.mgrid[:96, :96]
    for _ in range(10):
        cy, cx = rng.integers(10, 86, 2)
        m = (yy - cy) ** 2 + (xx - cx) ** 2 <= 64
        img[m] = [100, 60, 140]
    img += rng.normal(0, 3, img.shape).astype(np.float32)
    img = np.clip(img, 0, 255)
    return img.transpose(2, 0, 1) if chw else img


def test_hed_transform_changes_image_and_preserves_shape():
    img = he_like_image()
    out = HEDTransform(seed=0).transform(img)
    assert out.shape == img.shape
    assert not np.allclose(out, img)
    assert out.min() >= -1  # stays near original range
    assert np.isfinite(out).all()


def test_hed_transform_skips_background():
    white = np.full((3, 64, 64), 250.0, np.float32)
    out = HEDTransform(seed=0).transform(white)
    np.testing.assert_array_equal(out, white)  # cutoff skipped


def test_hed_handles_normalized_negatives():
    img = he_like_image() / 255.0 - 0.2  # normalized-ish with negatives
    out = HEDTransform(seed=1).transform(img)
    assert np.isfinite(out).all()


def test_he_staining_transform():
    img = he_like_image()
    out = HEStainingTransform(seed=0).transform(img)
    assert out.shape == img.shape
    assert np.isfinite(out).all()


def test_quality_transforms():
    img = he_like_image()
    blurred = GaussianBlurTransform(p=1.0, seed=0).transform(img)
    assert blurred.std() <= img.std()
    noisy = AdditiveNoiseTransform(p=1.0, sigma=0.05, seed=0).transform(img)
    assert not np.allclose(noisy, img)
    hbs = HueBrightnessSaturationTransform(p=1.0, seed=0).transform(img)
    assert hbs.shape == img.shape
    # p=0 is identity
    same = GaussianBlurTransform(p=0.0).transform(img)
    np.testing.assert_array_equal(same, img)


def test_stardist_pipeline_and_configs():
    assert set(AUGMENTATION_CONFIGS) == {"hed_only", "enhanced"}
    with pytest.raises(ValueError, match="Unknown augmentation config"):
        get_config("nope")
    img = he_like_image()
    aug = create_stardist_augmentation("enhanced", seed=0)
    out = aug.transform(img)
    assert out.shape == img.shape and np.isfinite(out).all()
    aug2 = StarDistAugmentation("hed_only", seed=0)
    out2 = aug2.transform(img)
    assert not np.allclose(out2, img)


def test_hed_rgb_roundtrip():
    from classpose_tpu.pipeline.tile_filter import hed2rgb, rgb2hed

    img = he_like_image(chw=False) / 255.0
    back = hed2rgb(rgb2hed(img))
    assert np.abs(back - img).max() < 0.02


def test_filter_tile_heuristic():
    from classpose_tpu.pipeline.tile_filter import filter_tile

    white = np.full((128, 128, 3), 250.0, np.float32)
    assert filter_tile(white) is False
    tissue = he_like_image(chw=False)
    assert filter_tile(tissue) is True
