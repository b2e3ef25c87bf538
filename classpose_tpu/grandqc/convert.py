"""GrandQC weight conversion: timm/smp torch checkpoints → flax params.

The published GrandQC weights (Zenodo, reference
grandqc/wsi_tissue_detection.py:27-29,81) are smp ``UnetPlusPlus``
checkpoints with a ``timm-efficientnet-b0`` encoder. This module converts:

- the **encoder** 1:1 — the timm efficientnet-b0 naming
  (``encoder.conv_stem`` / ``encoder.bn1`` / ``encoder.blocks.{s}.{i}.*``)
  maps directly onto :class:`classpose_tpu.grandqc.nets.EfficientNetB0Encoder`;
- the **decoder + segmentation head** 1:1 — the flax
  :class:`~classpose_tpu.grandqc.nets.UnetPlusPlusDecoder` replicates
  smp's UnetPlusPlusDecoder block graph and parameter layout
  (``decoder.blocks.x_{depth}_{layer}.conv{1,2}.{0,1}``, attention=None),
  so every tensor of a published checkpoint grafts directly. The
  conversion tracks key consumption: any weight left unconsumed (other
  than BatchNorm ``num_batches_tracked`` counters, which have no
  inference effect) is reported, and ``strict=True`` turns that into an
  error.
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


class _TrackingDict(dict):
    """State-dict wrapper recording which keys the converters consumed."""

    def __init__(self, sd):
        super().__init__(sd)
        self.accessed: set[str] = set()

    def __getitem__(self, key):
        self.accessed.add(key)
        return super().__getitem__(key)

    def __contains__(self, key):
        hit = super().__contains__(key)
        if hit:
            self.accessed.add(key)
        return hit


def _decoder_block_names(decoder_channels=(256, 128, 64, 32, 16)):
    depth = len(decoder_channels) - 1
    names = [
        f"x_{d}_{d + layer}"
        for layer in range(depth)
        for d in range(depth - layer)
    ]
    names.append(f"x_0_{depth}")
    return names


def convert_unetpp_decoder(sd: dict, prefix: str = "decoder.") -> dict:
    """Map smp UnetPlusPlusDecoder weights
    (``decoder.blocks.x_{d}_{l}.conv{1,2}.{0:conv,1:bn}``) onto the flax
    :class:`~classpose_tpu.grandqc.nets.UnetPlusPlusDecoder` tree."""
    p: dict = {}
    for name in _decoder_block_names():
        t = f"{prefix}blocks.{name}"
        p[name] = {
            "conv1_0": _conv(sd, f"{t}.conv1.0"),
            "conv1_1": _bn(sd, f"{t}.conv1.1"),
            "conv2_0": _conv(sd, f"{t}.conv2.0"),
            "conv2_1": _bn(sd, f"{t}.conv2.1"),
        }
    return p


def _check_tree_shapes(converted: dict, expected: dict, where: str):
    import jax

    exp = {
        "/".join(str(k.key) for k in path): leaf.shape
        for path, leaf in
        jax.tree_util.tree_flatten_with_path(expected)[0]
    }
    got = {
        "/".join(str(k.key) for k in path): np.asarray(leaf).shape
        for path, leaf in
        jax.tree_util.tree_flatten_with_path(converted)[0]
    }
    if set(exp) != set(got):
        raise ValueError(
            f"{where}: converted tree structure mismatch: "
            f"{sorted(set(exp) ^ set(got))[:10]}"
        )
    for k in exp:
        if tuple(exp[k]) != tuple(got[k]):
            raise ValueError(
                f"{where}: shape mismatch at {k}: expected {exp[k]}, "
                f"got {got[k]}"
            )


def convert_grandqc_checkpoint(
    sd: dict[str, np.ndarray], classes: int, strict: bool = False
):
    """Convert an smp UnetPlusPlus(timm-efficientnet-b0) state dict.

    Returns (params, converted_fraction). Encoder, decoder and
    segmentation head all graft 1:1; a checkpoint without decoder keys
    (bare timm encoder) grafts the encoder and leaves the decoder/head
    randomly initialized. ``strict=True`` errors if any checkpoint tensor
    other than BatchNorm step counters goes unconsumed.
    """
    import jax
    import numpy as np_

    from classpose_tpu.grandqc.nets import UnetPlusPlus, UnetPlusPlusConfig

    tracked = _TrackingDict(sd)
    enc = convert_efficientnet_b0_encoder(tracked)
    has_decoder = any(k.startswith("decoder.") for k in sd)

    cfg = UnetPlusPlusConfig(classes=classes)
    net = UnetPlusPlus(cfg)
    params = net.init(
        jax.random.PRNGKey(0), np_.zeros((1, 3, 64, 64), np_.float32)
    )
    _check_tree_shapes(enc, params["params"]["encoder"], "encoder")
    params["params"]["encoder"] = enc
    n_grafted = len(jax.tree_util.tree_leaves(enc))

    if has_decoder:
        try:
            dec = convert_unetpp_decoder(tracked)
        except KeyError as e:
            raise ValueError(
                f"checkpoint has decoder.* keys but not the full smp "
                f"UnetPlusPlus decoder layout (missing {e})"
            ) from e
        _check_tree_shapes(dec, params["params"]["decoder"], "decoder")
        params["params"]["decoder"] = dec
        head = {
            "kernel": _conv_t2f(tracked["segmentation_head.0.weight"]),
            "bias": tracked["segmentation_head.0.bias"],
        }
        _check_tree_shapes(
            head, params["params"]["segmentation_head"], "segmentation_head"
        )
        params["params"]["segmentation_head"] = head
        n_grafted += len(jax.tree_util.tree_leaves(dec)) + 2

    leftovers = [
        k for k in sd
        if k not in tracked.accessed
        and not k.endswith("num_batches_tracked")
    ]
    if leftovers:
        msg = (
            f"GrandQC conversion left {len(leftovers)} checkpoint tensors "
            f"unconsumed: {leftovers[:8]}"
        )
        if strict:
            raise ValueError(msg)
        logger.warning(msg)

    n_all = len(jax.tree_util.tree_leaves(params))
    logger.info(
        "GrandQC conversion: grafted %d/%d tensors (%s)", n_grafted, n_all,
        "encoder+decoder+head" if has_decoder else
        "encoder only — decoder randomly initialized",
    )
    return params, n_grafted / n_all
