"""``classpose-predict-wsi`` CLI.

Flag-for-flag compatible with the reference argparse surface
(predict_wsi.py:1891-2021), which the QuPath extension drives
(ClassposePredictWSIAction.java:380-438). TPU-specific additions:
``--device`` accepts ``tpu``/``tpu:0,1``-style mesh selection (the
reference's ``cuda:0,1`` syntax also works and maps onto the local
accelerators), and ``--mpp`` overrides slide resolution when metadata is
missing.
"""

from __future__ import annotations

import argparse

from classpose_tpu.pipeline.predict_wsi import main
from classpose_tpu.pipeline.slide_loader import (
    DEFAULT_OVERLAP,
    DEFAULT_TILE_SIZE,
)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Run Classpose WSI inference (TPU-native)."
    )
    parser.add_argument(
        "--model_config", type=str, required=True,
        help="One of 'conic', 'consep', 'glysac', 'monusac', 'nucls', "
        "'puma' or a path to a Classpose model config YAML.",
    )
    parser.add_argument(
        "--slide_path", type=str, required=True, nargs="+",
        help="Path(s) (or HTTP/HTTPS URLs) of the whole-slide image(s); "
        "multiple slides share one model (jit programs load once).",
    )
    parser.add_argument(
        "--tissue_detection_model_path", type=str, default=None,
        help="Path to the GrandQC tissue detection model weights.",
    )
    parser.add_argument(
        "--artefact_detection_model_path", type=str, default=None,
        help="Path to the GrandQC artefact detection model weights.",
    )
    parser.add_argument(
        "--filter_artefacts", action=argparse.BooleanOptionalAction,
        default=False,
        help="Filter cells detected in artefact regions.",
    )
    parser.add_argument(
        "--roi_geojson", type=str, default=None,
        help="FeatureCollection with (Multi)Polygon(s) in level-0 coords.",
    )
    parser.add_argument(
        "--roi_class_priority", type=str, default=None, nargs="+",
        help="ROI class names in priority order for overlapping regions.",
    )
    parser.add_argument(
        "--min_area", type=int, default=0,
        help="Minimum area of the tissue polygons.",
    )
    parser.add_argument(
        "--tta", action=argparse.BooleanOptionalAction, default=False,
        help="Test-time augmentation.",
    )
    parser.add_argument(
        "--batch_size", type=int, default=32,
        help="Net tiles per forward chunk. The reference's default 8 is a "
        "GPU-memory bound; on TPU running a 1024-tile's whole 25-tile "
        "grid in one chunk is ~20%% faster.",
    )
    parser.add_argument(
        "--device", type=str, default=None,
        help="Device selection; 'tpu', 'tpu:0,1', 'cpu' or the reference's "
        "'cuda:0,1' syntax (mapped to local accelerators).",
    )
    parser.add_argument(
        "--precision", type=str, default="bf16",
        choices=["fp32", "fp16", "bf16"],
        help="Inference precision ('fp16' maps to bf16 on TPU).",
    )
    parser.add_argument("--tile_size", type=int, default=DEFAULT_TILE_SIZE)
    parser.add_argument("--overlap", type=int, default=DEFAULT_OVERLAP)
    parser.add_argument("--output_folder", type=str, required=True)
    parser.add_argument(
        "--output_type", type=str, default=None, nargs="+",
        choices=["csv", "spatialdata"],
    )
    parser.add_argument(
        "--inference_threads", type=int, default=None,
        help="Host post-processing threads (device compute is async).",
    )
    parser.add_argument(
        "--mpp", type=float, default=None,
        help="Override slide microns-per-pixel when metadata is missing.",
    )
    parser.add_argument(
        "--profile", type=str, default=None,
        help="Directory for a jax.profiler trace of the run.",
    )
    parser.add_argument(
        "--tile_batch", type=int, default=None,
        help="Slide tiles per device program (batches normalization, "
        "forward and Euler integration; amortizes dispatch overhead). "
        "Default: max(4, n_devices). 1 forces the per-tile eval path.",
    )
    parser.add_argument(
        "--filter_background_tiles", action="store_true", default=False,
        help="Skip tiles failing the grey-histogram/blur/HED relevance "
        "heuristic (useful without a tissue detection model).",
    )
    parser.add_argument(
        "--fast_qc", action="store_true", default=False,
        help="Throughput approximations: half-resolution flow-QC and "
        "strided percentile stats (changes results for thin/small "
        "instances near the flow threshold).",
    )
    parser.add_argument(
        "--progress", action="store_true", default=None,
        help="Force the live progress line (tiles predicted / cells "
        "detected / tiles/s); auto-enabled on a TTY, or via "
        "CLASSPOSE_PROGRESS=1.",
    )
    return parser


def main_with_args(argv=None):
    args = build_parser().parse_args(argv)
    from classpose_tpu.parallel.mesh import enable_compilation_cache

    enable_compilation_cache()
    slides = (
        args.slide_path if isinstance(args.slide_path, list)
        else [args.slide_path]
    )
    model = None
    if len(slides) > 1:
        from classpose_tpu.model_configs import resolve_model_config
        from classpose_tpu.pipeline.predict_wsi import (
            build_model_from_config,
        )

        config = resolve_model_config(args.model_config)
        config.download_if_necessary()
        model = build_model_from_config(
            config, precision=args.precision,
            n_config_labels=len(config.cell_types),
        )
    for slide in slides:
        args.slide_path = slide
        main(args, model_override=model)


if __name__ == "__main__":
    main_with_args()
