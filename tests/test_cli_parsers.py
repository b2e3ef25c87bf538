"""Smoke tests: every CLI parser builds and parses its documented flags."""

import pytest


def test_predict_wsi_parser():
    from classpose_tpu.entrypoints.predict_wsi import build_parser

    args = build_parser().parse_args(
        [
            "--model_config", "conic", "--slide_path", "s.svs",
            "--output_folder", "out", "--tta", "--precision", "bf16",
            "--device", "tpu:0,1", "--tile_batch", "4", "--fast_qc",
            "--filter_background_tiles", "--output_type", "csv",
            "spatialdata", "--roi_class_priority", "Tumour", "Stroma",
        ]
    )
    assert args.tta and args.tile_batch == 4
    assert args.output_type == ["csv", "spatialdata"]
    assert args.roi_class_priority == ["Tumour", "Stroma"]


def test_cpsam_parser():
    from classpose_tpu.entrypoints.predict_wsi_cpsam import build_parser

    args = build_parser().parse_args(
        ["--model_path", "m.npz", "--train_mpp", "0.25",
         "--slide_path", "s.svs", "--output_folder", "out"]
    )
    assert args.train_mpp == 0.25


@pytest.mark.parametrize(
    "module,argv",
    [
        ("calculate_metrics",
         ["--gt_path", "g.npy", "--pred_path", "p.npy", "--binary"]),
        ("run_training", ["--data_path", "d"]),
        ("run_inference", ["--data_path", "d", "--model_path", "m.npz"]),
        ("dataset_to_hdf5", ["--data_path", "d", "--output", "o.h5"]),
        ("detect_tissue",
         ["--slide_path", "s", "--model_path", "m", "--output_folder", "o"]),
        ("detect_artefacts",
         ["--slide_path", "s", "--model_path", "m", "--output_folder", "o"]),
        ("convert_weights", ["--input", "i.pt", "--output", "o.npz"]),
    ],
)
def test_other_parsers(module, argv):
    import importlib

    mod = importlib.import_module(f"classpose_tpu.entrypoints.{module}")
    # each exposes build_parser or parses inside main_with_args; use the
    # parser when present, else verify main_with_args raises on the
    # missing files rather than on argument parsing
    if hasattr(mod, "build_parser"):
        mod.build_parser().parse_args(argv)
    else:
        import argparse

        # re-parse via the module's argparse path without executing main
        import unittest.mock as mock

        with mock.patch.object(mod, "main", lambda a: a):
            mod.main_with_args(argv)
