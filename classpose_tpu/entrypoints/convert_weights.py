"""``classpose-convert-weights`` CLI: torch checkpoints → native ``.npz``.

Converts the published torch weights offline so inference hosts don't need
torch installed:

- ClassTransformer checkpoints (cpsam + the six classpose configs): the
  full architecture is inferred from tensor shapes and embedded as meta;
- GrandQC smp UnetPlusPlus checkpoints (``--kind grandqc``): grafts the
  timm efficientnet-b0 encoder 1:1 (decoder fine-tune required — see
  classpose_tpu.grandqc.convert); the class count is read from the
  checkpoint's segmentation head.
"""

from __future__ import annotations

import argparse

from classpose_tpu.log import get_logger

logger = get_logger(__name__)


def main(args):
    from classpose_tpu.nn.convert import (
        _torch_load,
        convert_state_dict,
        infer_config_from_state_dict,
        save_params,
    )

    sd = _torch_load(args.input)
    if args.kind == "classpose":
        params = convert_state_dict(sd)
        cfg = infer_config_from_state_dict(sd)
        logger.info("inferred config: %s", cfg)
        save_params(params, args.output, cfg)
    else:  # grandqc
        from classpose_tpu.grandqc.convert import convert_grandqc_checkpoint
        from classpose_tpu.grandqc.nets import UnetPlusPlusConfig

        head_key = next(
            (k for k in sd if k.startswith("segmentation_head")
             and k.endswith("weight")),
            None,
        )
        classes = (
            int(sd[head_key].shape[0]) if head_key is not None
            else args.classes
        )
        logger.info("segmentation classes: %d", classes)
        from classpose_tpu.nn.manifest import (
            grandqc_manifest,
            manifest_diff,
        )

        d = manifest_diff(sd, grandqc_manifest(classes))
        if d["match"]:
            logger.info("checkpoint matches the Zenodo key/shape manifest")
        else:
            logger.warning(
                "checkpoint deviates from the Zenodo manifest: %d missing, "
                "%d unexpected, %d shape mismatches — %s",
                len(d["missing"]), len(d["unexpected"]),
                len(d["shape_mismatch"]),
                (d["missing"] + d["unexpected"])[:5],
            )
        params, frac = convert_grandqc_checkpoint(
            sd, classes=classes, strict=args.strict
        )
        save_params(params, args.output, UnetPlusPlusConfig(classes=classes))
        logger.info("grafted fraction: %.2f", frac)
    logger.info("wrote %s", args.output)


def main_with_args(argv=None):
    p = argparse.ArgumentParser(
        description="Convert torch checkpoints to native .npz weights."
    )
    p.add_argument("--input", required=True, help="torch .pt checkpoint")
    p.add_argument("--output", required=True, help="output .npz path")
    p.add_argument("--kind", choices=["classpose", "grandqc"],
                   default="classpose")
    p.add_argument("--classes", type=int, default=2,
                   help="segmentation classes fallback when the grandqc "
                   "checkpoint has no segmentation_head tensor")
    p.add_argument("--strict", action="store_true", default=False)
    main(p.parse_args(argv))


if __name__ == "__main__":
    main_with_args()
