"""GrandQC tissue/artefact quality-control subsystem.

TPU rebuild of the reference grandqc/ package: UNet++ segmentation nets with
a (TF-padded) EfficientNet-B0 encoder running as batched JAX inference, plus
the tissue/artefact WSI detection pipelines (thumbnail extraction at fixed
MPP, JPEG-compression simulation, 512² patch grids, connected-component
area filtering, contour+hole extraction, GeoJSON output)."""

from classpose_tpu.grandqc.nets import UnetPlusPlus, EfficientNetB0Encoder
from classpose_tpu.grandqc.tissue import detect_tissue_wsi
from classpose_tpu.grandqc.artefact import detect_artefacts_wsi

__all__ = [
    "UnetPlusPlus",
    "EfficientNetB0Encoder",
    "detect_tissue_wsi",
    "detect_artefacts_wsi",
]
