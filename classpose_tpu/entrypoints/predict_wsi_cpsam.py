"""``classpose-predict-wsi-cpsam`` CLI: the WSI pipeline for a vanilla
single-class Cellpose-SAM model (no semantic head).

Parity target: reference entrypoints/predict_wsi_cpsam.py — same
SlideLoader/PostProcessor/GeoJSON machinery, but the model is a plain
CellposeSAM loaded from ``--model_path`` with ``--train_mpp``, and every
cell gets the single "cell" label (color [0, 168, 132]).
"""

from __future__ import annotations

import argparse

from classpose_tpu.log import get_logger
from classpose_tpu.model_configs import ModelConfig
from classpose_tpu.pipeline.predict_wsi import main as _pipeline_main
from classpose_tpu.pipeline.slide_loader import (
    DEFAULT_OVERLAP,
    DEFAULT_TILE_SIZE,
)

logger = get_logger(__name__)


def main(args, model_override=None):
    cfg = ModelConfig(
        path=args.model_path,
        mpp=args.train_mpp,
        cell_types=["cell"],
    )

    class _Args:
        pass

    a = _Args()
    for k, v in vars(args).items():
        setattr(a, k, v)
    a.model_config = cfg  # pipeline.main accepts a ModelConfig directly

    if model_override is None and not str(args.model_path).endswith(
        (".npz", ".pt")
    ):
        raise ValueError(
            "--model_path must point to a .npz or .pt checkpoint"
        )
    return _pipeline_main(a, model_override=model_override)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Run vanilla CellposeSAM WSI inference (single class)."
    )
    parser.add_argument("--model_path", type=str, required=True,
                        help="Path to the CellposeSAM weights (.npz/.pt).")
    parser.add_argument("--train_mpp", type=float, default=0.5,
                        help="MPP the model was trained at.")
    parser.add_argument("--slide_path", type=str, required=True)
    parser.add_argument("--tissue_detection_model_path", type=str,
                        default=None)
    parser.add_argument("--artefact_detection_model_path", type=str,
                        default=None)
    parser.add_argument("--filter_artefacts",
                        action=argparse.BooleanOptionalAction, default=False)
    parser.add_argument("--roi_geojson", type=str, default=None)
    parser.add_argument("--min_area", type=int, default=0)
    parser.add_argument("--tta", action=argparse.BooleanOptionalAction,
                        default=False)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--device", type=str, default=None)
    parser.add_argument("--precision", type=str, default="bf16",
                        choices=["fp32", "fp16", "bf16"])
    parser.add_argument("--tile_size", type=int, default=DEFAULT_TILE_SIZE)
    parser.add_argument("--overlap", type=int, default=DEFAULT_OVERLAP)
    parser.add_argument("--output_folder", type=str, required=True)
    parser.add_argument("--output_type", type=str, default=None, nargs="+",
                        choices=["csv", "spatialdata"])
    parser.add_argument("--inference_threads", type=int, default=None)
    parser.add_argument("--mpp", type=float, default=None)
    parser.add_argument("--tile_batch", type=int, default=1)
    parser.add_argument("--fast_qc", action="store_true", default=False)
    parser.add_argument("--filter_background_tiles", action="store_true",
                        default=False)
    parser.add_argument("--profile", type=str, default=None)
    parser.add_argument("--roi_class_priority", type=str, default=None,
                        nargs="+")
    return parser


def main_with_args(argv=None):
    args = build_parser().parse_args(argv)
    from classpose_tpu.parallel.mesh import enable_compilation_cache

    enable_compilation_cache()
    main(args)


if __name__ == "__main__":
    main_with_args()
