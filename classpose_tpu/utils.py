"""General utilities: output-filename templates, downloads, slide resolution,
device/mesh parsing, and label sparsification.

Functional parity targets (reference file:line):
- GeoJSON filename templates + env overrides: utils.py:29-72
- streaming download with ALLOW_UNSAFE_REQUESTS gate: utils.py:241-282
- slide MPP resolution from reader properties: utils.py:285-331
- device parsing incl. multi-device lists: utils.py:118-148 (re-targeted at
  TPU mesh selection: "tpu:0,1" selects devices of the JAX mesh)
- make_sparse label sparsifier: utils.py:151-208
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from classpose_tpu.log import get_logger

utils_logger = get_logger(__name__)

ALLOW_UNSAFE_REQUESTS = os.getenv("ALLOW_UNSAFE_REQUESTS", "false").lower() in [
    "true",
    "1",
]

GEOJSON_OUTPUT_TEMPLATES = {
    "cell_contours": os.getenv(
        "CLASSPOSE_CELL_CONTOURS_GEOJSON", "{base_name}_cell_contours.geojson"
    ),
    "cell_centroids": os.getenv(
        "CLASSPOSE_CELL_CENTROIDS_GEOJSON", "{base_name}_cell_centroids.geojson"
    ),
    "tissue_contours": os.getenv(
        "CLASSPOSE_TISSUE_CONTOURS_GEOJSON",
        "{base_name}_tissue_contours.geojson",
    ),
    "artefact_contours": os.getenv(
        "CLASSPOSE_ARTEFACT_CONTOURS_GEOJSON",
        "{base_name}_artefact_contours.geojson",
    ),
    "roi": os.getenv("CLASSPOSE_ROI_GEOJSON", "{base_name}_roi.geojson"),
}


def get_geojson_output_filename(output_kind: str, base_name: str) -> str:
    """Resolve the output filename for one of the GeoJSON artifact kinds.

    This is part of the QuPath-extension contract (reference utils.py:52-72,
    mirrored by ImportConventions.java) and must stay stable.
    """
    if output_kind not in GEOJSON_OUTPUT_TEMPLATES:
        valid = ", ".join(GEOJSON_OUTPUT_TEMPLATES)
        raise ValueError(
            f"Invalid output kind: {output_kind}. Valid options are: {valid}"
        )
    return GEOJSON_OUTPUT_TEMPLATES[output_kind].format(base_name=base_name)


def download_if_unavailable(path: str, url: str, chunk_size: int = 1 << 20) -> str:
    """Stream ``url`` to ``path`` unless it already exists.

    Refuses plain-http URLs unless ``ALLOW_UNSAFE_REQUESTS`` is set, like the
    reference (utils.py:241-282). Idempotent: re-running after a failure
    retries the download.
    """
    path = str(path)
    if os.path.exists(path):
        return path
    if url.startswith("http://") and not ALLOW_UNSAFE_REQUESTS:
        raise ValueError(
            f"Refusing insecure download from {url}; set "
            "ALLOW_UNSAFE_REQUESTS=true to override."
        )
    import requests

    Path(path).parent.mkdir(parents=True, exist_ok=True)
    tmp = path + ".part"
    with requests.get(url, stream=True, timeout=60) as r:
        r.raise_for_status()
        with open(tmp, "wb") as f:
            for chunk in r.iter_content(chunk_size=chunk_size):
                f.write(chunk)
    os.replace(tmp, path)
    return path


def get_slide_resolution(slide) -> tuple[float, float] | None:
    """Return (mpp_x, mpp_y) microns-per-pixel for a slide reader object.

    Follows the reference's resolution-probing order (utils.py:285-331):
    explicit ``openslide.mpp-x/y`` properties first, then TIFF resolution
    tags with centimeter/inch unit conversion.
    """
    props = getattr(slide, "properties", {}) or {}

    def _get(keys):
        for key in keys:
            if key in props:
                try:
                    return float(props[key])
                except (TypeError, ValueError):
                    pass
        return None

    x = _get(("openslide.mpp-x", "mpp-x", "mpp"))
    y = _get(("openslide.mpp-y", "mpp-y", "mpp"))
    if x is not None:
        return (x, y if y is not None else x)
    # TIFF resolution tags: pixels per resolution unit
    unit = props.get("tiff.ResolutionUnit", "inch")

    def _from_res(key):
        res = props.get(key)
        if not res:
            return None
        try:
            res = float(res)
        except (TypeError, ValueError):
            return None
        if res <= 0:
            return None
        if str(unit).lower().startswith("cent"):
            return 10_000.0 / res
        return 25_400.0 / res

    x = _from_res("tiff.XResolution")
    y = _from_res("tiff.YResolution")
    if x is not None:
        return (x, y if y is not None else x)
    return None


def get_device(device: str | None) -> list:
    """Parse a ``--device`` flag into a list of JAX devices.

    Accepts the reference's ``cuda:0,1`` syntax (utils.py:118-148) mapped to
    TPU: ``tpu``, ``tpu:0,1``, ``cpu``, or ``cuda:...`` (treated as an alias
    for the local accelerator platform so existing QuPath invocations keep
    working on a TPU host).
    """
    import jax

    if device is None or device == "":
        # auto: single default device (multi-device must be explicit, like
        # the reference's 'cuda:0,1')
        return [jax.devices()[0]]
    device = device.strip().lower()
    if ":" in device:
        platform, idx_str = device.split(":", 1)
        indices = [int(i) for i in idx_str.split(",") if i != ""]
    else:
        platform, indices = device, None
    if platform in ("cuda", "gpu", "tpu", "accelerator"):
        devs = [d for d in jax.devices() if d.platform != "cpu"]
        if not devs:  # CPU-only host: degrade gracefully
            devs = jax.devices()
    elif platform == "cpu":
        devs = jax.devices("cpu")
    else:
        devs = jax.devices()
    if indices is not None:
        devs = [devs[i] for i in indices]
    return devs


def make_sparse(
    labels: np.ndarray, keep_fraction: float, rng: np.random.Generator | None = None
) -> np.ndarray:
    """Sparsify class annotations: keep only ``keep_fraction`` of annotated
    instances' class labels, setting the rest to 0 (unannotated).

    Equivalent capability to reference utils.py:151-208 (used to emulate
    sparse annotation regimes in the paper experiments). ``labels`` is
    ``(..., H, W)`` with channel 0 = class channel and channel 1 = instance
    channel when 4D per-sample layout is used; for a single (2, H, W) label
    the class channel is sparsified according to instance identity.
    """
    rng = rng or np.random.default_rng()
    labels = labels.copy()
    if labels.ndim == 3:
        labels = labels[None]
        squeeze = True
    else:
        squeeze = False
    for i in range(labels.shape[0]):
        cls, inst = labels[i, 0], labels[i, 1]
        ids = np.unique(inst)
        ids = ids[ids > 0]
        if len(ids) == 0:
            continue
        n_keep = max(1, int(round(keep_fraction * len(ids))))
        keep = rng.choice(ids, size=n_keep, replace=False)
        drop_mask = (inst > 0) & ~np.isin(inst, keep)
        cls[drop_mask] = 0
        labels[i, 0] = cls
    return labels[0] if squeeze else labels
