"""Neural networks (JAX/flax): ViT-L SAM encoder with flow + class heads,
the class-head UNet, and the GrandQC UNet++/EfficientNet-B0 QC nets."""

from classpose_tpu.nn.vit_sam import ClassTransformer, ClassTransformerConfig
from classpose_tpu.nn.unet import UNet

__all__ = ["ClassTransformer", "ClassTransformerConfig", "UNet"]
