"""``classpose-convert-weights`` CLI: torch checkpoints → native ``.npz``.

Converts the published torch weights offline so inference hosts don't need
torch installed:

- ClassTransformer checkpoints (cpsam + the six classpose configs):
  auto-detects the class-head structure and class count
  (reference predict_wsi.py:1377-1419) and embeds the architecture meta;
- GrandQC smp UnetPlusPlus checkpoints (``--kind grandqc``): grafts the
  timm efficientnet-b0 encoder 1:1 (decoder fine-tune required — see
  classpose_tpu.grandqc.convert).
"""

from __future__ import annotations

import argparse

from classpose_tpu.log import get_logger

logger = get_logger(__name__)


def main(args):
    import numpy as np

    from classpose_tpu.nn.convert import (
        _torch_load,
        convert_state_dict,
        infer_structure,
        save_params,
    )

    if args.kind == "classpose":
        structure, n_classes = infer_structure(args.input)
        logger.info(
            "structure=%s n_classes=%d", structure, n_classes
        )
        sd = _torch_load(args.input)
        params = convert_state_dict(sd)
        from classpose_tpu.nn import ClassTransformerConfig

        # infer the architecture from tensor shapes, not defaults
        pe = sd["encoder.patch_embed.proj.weight"]  # (E, 3, ps, ps)
        embed_dim, ps = int(pe.shape[0]), int(pe.shape[2])
        thw = int(sd["encoder.pos_embed"].shape[1])
        head_dim = int(sd["encoder.blocks.0.attn.rel_pos_h"].shape[1])
        depth = 0
        while f"encoder.blocks.{depth}.norm1.weight" in sd:
            depth += 1
        neck_dim = int(sd["encoder.neck.0.weight"].shape[0])
        cfg = ClassTransformerConfig(
            ps=ps,
            bsize=thw * ps,
            embed_dim=embed_dim,
            depth=depth,
            num_heads=max(1, embed_dim // head_dim),
            neck_dim=neck_dim,
            n_cell_classes=max(n_classes, 1),
            feature_transformation_structure=(
                tuple(structure) if structure else None
            ),
        )
        logger.info("inferred config: %s", cfg)
        save_params(params, args.output, cfg)
    else:  # grandqc
        from classpose_tpu.grandqc.convert import convert_grandqc_checkpoint
        from classpose_tpu.grandqc.nets import UnetPlusPlusConfig
        from classpose_tpu.nn.convert import _torch_load as _tl
        from classpose_tpu.nn.convert import save_params as _sp

        sd = _tl(args.input)
        params, frac = convert_grandqc_checkpoint(
            sd, classes=args.classes, strict=args.strict
        )
        _sp(params, args.output, UnetPlusPlusConfig(classes=args.classes))
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
                   help="segmentation classes (grandqc)")
    p.add_argument("--strict", action="store_true", default=False)
    main(p.parse_args(argv))


if __name__ == "__main__":
    main_with_args()
