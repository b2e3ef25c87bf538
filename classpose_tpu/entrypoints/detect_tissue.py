"""GrandQC tissue-detection CLI (drives the QuPath tissue action).

Writes ``{base}_tissue_contours.geojson`` into the output folder.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

from classpose_tpu.grandqc import detect_tissue_wsi
from classpose_tpu.log import get_logger
from classpose_tpu.utils import get_geojson_output_filename

logger = get_logger(__name__)


def main(args):
    res = detect_tissue_wsi(
        args.slide_path,
        model_path=args.model_path,
        min_area=args.min_area,
    )
    out = Path(args.output_folder)
    out.mkdir(parents=True, exist_ok=True)
    base = Path(args.slide_path).name.rsplit(".", 1)[0]
    path = out / get_geojson_output_filename("tissue_contours", base)
    path.write_text(json.dumps(res["geojson"]))
    logger.info("wrote %s (%d regions)", path, len(res["polygons"]))
    return res


def main_with_args(argv=None):
    p = argparse.ArgumentParser(description="GrandQC tissue detection.")
    p.add_argument("--slide_path", required=True)
    p.add_argument("--model_path", required=True,
                   help="tissue UNet++ weights (.npz)")
    p.add_argument("--output_folder", required=True)
    p.add_argument("--min_area", type=float, default=0.0,
                   help="min region area in µm²")
    main(p.parse_args(argv))


if __name__ == "__main__":
    main_with_args()
