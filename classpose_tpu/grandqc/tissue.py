"""GrandQC tissue detection over a whole slide.

Parity target: reference grandqc/wsi_tissue_detection.py:32-329 —
thumbnail at MPP 10, JPEG-compression simulation, 512² patch inference
with the 2-class UNet++ (class 1 = tissue), µm² connected-component
filtering, contour+hole extraction, and level-0 GeoJSON. Model weights are
native ``.npz`` (converted from the Zenodo torch checkpoints); tests inject
``predict_fn`` oracles.
"""

from __future__ import annotations

import numpy as np

from classpose_tpu.geometry import Polygon
from classpose_tpu.grandqc.helpers import (
    contours_to_geojson_features,
    contours_with_holes,
    extract_slide_thumbnail,
    filter_components_by_area,
    predict_mask,
    simulate_jpeg_compression,
)
from classpose_tpu.log import get_logger

logger = get_logger(__name__)

MPP_TISSUE_MODEL = 10.0


def make_unetpp_predict_fn(model_path: str, classes: int):
    """Load a UNet++ .npz checkpoint and return a batched argmax
    predict_fn (patches (B, 512, 512, 3) uint8 → (B, 512, 512) int32)."""
    import jax
    import jax.numpy as jnp

    from classpose_tpu.grandqc.nets import UnetPlusPlus, UnetPlusPlusConfig
    from classpose_tpu.nn.convert import load_npz_checkpoint

    params, meta = load_npz_checkpoint(model_path)
    if meta is not None:
        meta = {
            k: tuple(v) if isinstance(v, list) else v
            for k, v in meta.items()
        }
        cfg = UnetPlusPlusConfig(**{**meta, "classes": classes}
                                 if "classes" not in meta else meta)
    else:
        cfg = UnetPlusPlusConfig(classes=classes)
    net = UnetPlusPlus(cfg)
    # imagenet normalization (smp preprocessing for timm-efficientnet)
    mean = jnp.asarray([0.485, 0.456, 0.406])
    std = jnp.asarray([0.229, 0.224, 0.225])

    @jax.jit
    def fwd(x):
        x = (x.astype(jnp.float32) / 255.0 - mean) / std
        logits = net.apply(params, jnp.transpose(x, (0, 3, 1, 2)))
        return jnp.argmax(logits, axis=1).astype(jnp.int32)

    return lambda batch: np.asarray(fwd(np.asarray(batch)))


def detect_tissue_wsi(
    slide_or_path,
    model_path: str | None = None,
    predict_fn=None,
    min_area: float = 0.0,
    mpp_model: float = MPP_TISSUE_MODEL,
    jpeg_quality: int = 80,
) -> dict:
    """Run tissue detection. Returns dict with keys:
    thumb, mask, contours, polygons (thumb coords), polygons_level0,
    geojson, mpp, scale_to_level0."""
    from classpose_tpu import WSIReader

    slide = (
        WSIReader(slide_or_path)
        if isinstance(slide_or_path, str)
        else slide_or_path
    )
    thumb, scale, mpp = extract_slide_thumbnail(slide, mpp_model)
    thumb_sim = simulate_jpeg_compression(thumb, quality=jpeg_quality)

    if predict_fn is None:
        if model_path is None:
            raise ValueError(
                "either model_path or predict_fn must be provided"
            )
        predict_fn = make_unetpp_predict_fn(model_path, classes=2)

    mask = predict_mask(thumb_sim, predict_fn) == 1
    mask = filter_components_by_area(mask, min_area, mpp_model)

    contour_list = contours_with_holes(mask)
    polygons = [
        Polygon(ext, holes=holes) for ext, holes in contour_list
    ]
    polygons_level0 = [
        Polygon(ext * scale, holes=[h * scale for h in holes])
        for ext, holes in contour_list
    ]
    features = contours_to_geojson_features(
        contour_list, scale, "Tissue", color=[0, 160, 0]
    )
    logger.info(
        "Tissue detection: %d regions, %.1f%% of thumbnail",
        len(polygons), 100.0 * mask.mean(),
    )
    return {
        "thumb": thumb,
        "mask": mask,
        "contours": contour_list,
        "polygons": polygons_level0,
        "polygons_thumb": polygons,
        "geojson": {"type": "FeatureCollection", "features": features},
        "mpp": mpp,
        "scale_to_level0": scale,
    }
