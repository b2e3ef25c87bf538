"""GrandQC weight conversion: timm/smp torch checkpoints → flax params.

The published GrandQC weights (Zenodo, reference
grandqc/wsi_tissue_detection.py:27-29,81) are smp ``UnetPlusPlus``
checkpoints with a ``timm-efficientnet-b0`` encoder. This module converts:

- the **encoder** 1:1 — the timm efficientnet-b0 naming
  (``encoder.conv_stem`` / ``encoder.bn1`` / ``encoder.blocks.{s}.{i}.*``)
  maps directly onto :class:`classpose_tpu.grandqc.nets.EfficientNetB0Encoder`;
- the **decoder** is *not* weight-compatible: this framework uses the
  paper-form UNet++ decoder rather than a replica of smp's internal block
  graph, so decoder weights require fine-tuning after conversion (or use
  ``strict=False`` to convert the encoder and randomly initialize the
  decoder). Verifying an exact smp decoder mapping requires
  segmentation_models_pytorch, which is not a dependency of this
  framework.
"""

from __future__ import annotations

import numpy as np

from classpose_tpu.log import get_logger
from classpose_tpu.nn.convert import _conv_t2f

logger = get_logger(__name__)

# blocks per stage in efficientnet-b0 (must match nets._B0_STAGES)
_B0_BLOCKS = [1, 2, 2, 3, 3, 4, 1]


def _bn(sd: dict, prefix: str) -> dict:
    return {
        "scale": sd[f"{prefix}.weight"],
        "bias": sd[f"{prefix}.bias"],
        "mean": sd[f"{prefix}.running_mean"],
        "var": sd[f"{prefix}.running_var"],
    }


def _conv(sd: dict, key: str, depthwise: bool = False) -> dict:
    w = sd[f"{key}.weight"]
    if depthwise:
        # torch depthwise (C, 1, kh, kw) → flax grouped (kh, kw, 1, C)
        k = np.transpose(w, (2, 3, 1, 0))
    else:
        k = _conv_t2f(w)
    out = {"conv": {"kernel": k}}
    if f"{key}.bias" in sd:
        out["conv"]["bias"] = sd[f"{key}.bias"]
    return out


def convert_efficientnet_b0_encoder(
    sd: dict[str, np.ndarray], prefix: str = "encoder."
) -> dict:
    """Map a timm efficientnet-b0 state dict (smp encoder prefix
    ``encoder.``) to the EfficientNetB0Encoder param tree."""
    p: dict = {}
    p["conv_stem"] = _conv(sd, f"{prefix}conv_stem")
    p["bn1"] = _bn(sd, f"{prefix}bn1")
    for s, n_blocks in enumerate(_B0_BLOCKS):
        for i in range(n_blocks):
            t = f"{prefix}blocks.{s}.{i}"
            b: dict = {}
            expand = s > 0
            if expand:
                b["conv_pw"] = _conv(sd, f"{t}.conv_pw")
                b["bn1"] = _bn(sd, f"{t}.bn1")
                b["conv_dw"] = _conv(sd, f"{t}.conv_dw", depthwise=True)
                b["bn2"] = _bn(sd, f"{t}.bn2")
                b["conv_pwl"] = _conv(sd, f"{t}.conv_pwl")
                b["bn3"] = _bn(sd, f"{t}.bn3")
            else:
                b["conv_dw"] = _conv(sd, f"{t}.conv_dw", depthwise=True)
                b["bn1"] = _bn(sd, f"{t}.bn1")
                b["conv_pw"] = _conv(sd, f"{t}.conv_pw")
                b["bn2"] = _bn(sd, f"{t}.bn2")
            b["se"] = {
                "conv_reduce": {
                    "kernel": _conv_t2f(sd[f"{t}.se.conv_reduce.weight"]),
                    "bias": sd[f"{t}.se.conv_reduce.bias"],
                },
                "conv_expand": {
                    "kernel": _conv_t2f(sd[f"{t}.se.conv_expand.weight"]),
                    "bias": sd[f"{t}.se.conv_expand.bias"],
                },
            }
            p[f"blocks_{s}_{i}"] = b
    return p


def convert_grandqc_checkpoint(
    sd: dict[str, np.ndarray], classes: int, strict: bool = False
):
    """Convert an smp UnetPlusPlus(timm-efficientnet-b0) state dict.

    Returns (params, converted_fraction). With ``strict=True`` a
    non-convertible decoder raises; otherwise the decoder/head are randomly
    initialized and the encoder weights are grafted in.
    """
    import jax
    import numpy as np_

    from classpose_tpu.grandqc.nets import UnetPlusPlus, UnetPlusPlusConfig

    enc = convert_efficientnet_b0_encoder(sd)
    if strict and any(k.startswith("decoder.") for k in sd):
        raise NotImplementedError(
            "smp UNet++ decoder weights are not layout-compatible with the "
            "paper-form decoder; convert with strict=False (encoder graft + "
            "decoder fine-tune)."
        )
    cfg = UnetPlusPlusConfig(classes=classes)
    net = UnetPlusPlus(cfg)
    params = net.init(
        jax.random.PRNGKey(0), np_.zeros((1, 3, 64, 64), np_.float32)
    )
    params["params"]["encoder"] = enc
    n_enc = len(jax.tree_util.tree_leaves(enc))
    n_all = len(jax.tree_util.tree_leaves(params))
    logger.info(
        "GrandQC conversion: grafted %d/%d tensors (encoder); decoder "
        "requires fine-tuning", n_enc, n_all,
    )
    return params, n_enc / n_all
