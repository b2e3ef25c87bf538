"""Histology augmentations (host-side numpy): HED stain perturbation,
NMF H&E staining transform, image-quality augmentations, and the StarDist
pipeline manager (reference src/classpose/transforms/, ≈1,215 LoC)."""

from classpose_tpu.transforms.hed import HEDTransform
from classpose_tpu.transforms.he_staining import HEStainingTransform
from classpose_tpu.transforms.image_quality import (
    AdditiveNoiseTransform,
    GaussianBlurTransform,
    HueBrightnessSaturationTransform,
    ImageQualityAugmentation,
)
from classpose_tpu.transforms.stardist_augmentation import (
    StarDistAugmentation,
    create_stardist_augmentation,
)
from classpose_tpu.transforms.augmentation_configs import (
    AUGMENTATION_CONFIGS,
    create_custom_config,
    get_config,
)

__all__ = [
    "HEDTransform",
    "HEStainingTransform",
    "AdditiveNoiseTransform",
    "GaussianBlurTransform",
    "HueBrightnessSaturationTransform",
    "ImageQualityAugmentation",
    "StarDistAugmentation",
    "create_stardist_augmentation",
    "AUGMENTATION_CONFIGS",
    "create_custom_config",
    "get_config",
]
