"""End-to-end WSI benchmark: synthetic JPEG pyramid → classpose pipeline.

Measures the full production path — tiled JPEG decode, pyramid/MPP math,
host→device streaming, the fused batched device program, polygon
extraction, dedup, exports — on one chip, and reports min/slide plus the
projection to the 100k×100k v5e-8 north star (BASELINE.md: <5 min).

Usage:
  python tools/bench_slide.py [--size 16384] [--cells-per-mm2 4000]
      [--out /tmp/slide_bench] [--reuse]

The slide is written once as a real tiled-JPEG BigTIFF (via
io/tiff_writer.py) so host read/decode costs are realistic; --reuse skips
regeneration on reruns.
"""

import argparse
import json
import os
import time
from pathlib import Path


def build_slide(path: Path, size: int, cells_per_mm2: float,
                mpp: float = 0.25) -> Path:
    import numpy as np

    from classpose_tpu.io.array_reader import synthetic_wsi
    from classpose_tpu.io.tiff_writer import write_tiled_tiff

    area_mm2 = (size * mpp / 1000.0) ** 2
    n_cells = int(cells_per_mm2 * area_mm2)
    print(f"generating {size}²px ({area_mm2:.0f} mm²) slide with "
          f"~{n_cells} cells ...", flush=True)
    t0 = time.time()
    slide, gt = synthetic_wsi(
        width=size, height=size, n_cells=n_cells, n_classes=3, mpp=mpp,
    )
    img = slide._level0
    print(f"  drawn {len(gt)} cells in {time.time() - t0:.0f}s", flush=True)
    t0 = time.time()
    write_tiled_tiff(path, img, tile=512, quality=80, mpp=mpp)
    sz = os.path.getsize(path) / 1e9
    print(f"  wrote {path} ({sz:.2f} GB) in {time.time() - t0:.0f}s",
          flush=True)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=16384)
    ap.add_argument("--cells-per-mm2", type=float, default=4000.0)
    ap.add_argument("--out", default="/tmp/slide_bench")
    ap.add_argument("--reuse", action="store_true")
    ap.add_argument("--tile_batch", type=int, default=4)
    ap.add_argument("--tile_size", type=int, default=1024)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model + fp32 (plumbing smoke test)")
    ap.add_argument(
        "--checkpoint",
        default=os.path.expanduser(
            "~/.cache/classpose_tpu/bench_ckpt.npz"
        ),
        help="model .npz (default: the structured bench checkpoint, "
        "built on demand — ~1k instances/tile, QC horizon 64, real "
        "host polygon/dedup work; pass '' for a random init, which "
        "measures the zero-cell floor and is NOT an honest load)")
    ap.add_argument("--host-vcpus", type=int, default=224,
                    help="vCPU count assumed for the v5e-8 host in the "
                    "projection (GCE ct5lp-hightpu-8t: 224)")
    args = ap.parse_args()

    if args.checkpoint and not os.path.exists(args.checkpoint):
        from classpose_tpu.nn import ClassTransformerConfig as _Cfg
        from classpose_tpu.nn.convert import save_params
        from classpose_tpu.nn.synthetic import structured_params

        Path(args.checkpoint).parent.mkdir(parents=True, exist_ok=True)
        bcfg = _Cfg(n_cell_classes=6, dtype="float32")
        save_params(structured_params(bcfg), args.checkpoint, bcfg)
        print(f"built structured checkpoint at {args.checkpoint}",
              flush=True)

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    slide_path = out / f"synthetic_{args.size}.tiff"
    if not (args.reuse and slide_path.exists()):
        build_slide(slide_path, args.size, args.cells_per_mm2)

    from classpose_tpu.nn import ClassTransformerConfig
    from classpose_tpu.parallel.mesh import enable_compilation_cache
    from classpose_tpu.pipeline.predict_wsi import main as pipeline_main
    from classpose_tpu.runner import ClassposeModel

    enable_compilation_cache()
    if args.tiny:
        model = ClassposeModel(
            cfg=ClassTransformerConfig(
                n_cell_classes=6, embed_dim=32, depth=1, num_heads=2,
                neck_dim=16, bsize=64,
            ),
            precision="fp32",
        )
    elif args.checkpoint:
        model = ClassposeModel(
            pretrained_model=args.checkpoint, precision="bf16"
        )
    else:
        model = ClassposeModel(
            cfg=ClassTransformerConfig(n_cell_classes=6,
                                       dtype="bfloat16"),
            precision="bf16",
        )

    run_args = type("Args", (), dict(
        model_config="conic",  # labels/MPP only; model is injected
        slide_path=str(slide_path),
        output_folder=str(out / "results"),
        tile_size=args.tile_size,
        overlap=64,
        batch_size=args.batch_size,
        precision="bf16",
        tta=False,
        roi_geojson=None,
        output_type=None,
        tissue_detection_model_path=None,
        artefact_detection_model_path=None,
        filter_artefacts=False,
        roi_class_priority=None,
        min_area=0,
        mpp=0.25,
        tile_batch=args.tile_batch,
    ))()

    # warm the fused program (cold ViT-L compiles are minutes and would
    # otherwise be billed to the slide)
    import numpy as np

    warm = np.zeros(
        (args.tile_batch, args.tile_size, args.tile_size, 3), np.uint8
    )
    t0 = time.time()
    model.eval_batch(warm, batch_size=args.batch_size, niter=200)
    print(f"warmup/compile: {time.time() - t0:.0f}s", flush=True)

    t0 = time.time()
    result = pipeline_main(run_args, model_override=model)
    wall = time.time() - t0

    n_tiles = result.get("n_tiles") or 0
    n_cells = result.get("n_cells") or 0
    minutes = wall / 60.0
    stages = result.get("stage_seconds", {})

    # ---- projection to the 100k×100k v5e-8 north star, with the
    # arithmetic written out per resource (VERDICT r3 item 2 — a v5e-8
    # has 8 chips but ONE host, so only device work divides by 8):
    #
    #   tiles scale with slide area:    S = (100000/size)²
    #   device:  measured device-path seconds × S / 8 chips
    #   host polygons: measured single-thread cells/s; the v5e-8 host
    #     (GCE ct5lp-hightpu-8t, --host-vcpus, default 224) runs the
    #     post pool wide, assumed to scale to min(32, vcpus) workers —
    #     process_tile is embarrassingly parallel per tile (this 1-vCPU
    #     bench host cannot demonstrate that scaling; the assumption is
    #     stated, not measured)
    #   read+decode: host-side too, same pool scaling assumption, and
    #     overlapped with device work by the pipeline; counted inside
    #     the host term via the measured stream wall minus device wall
    #   dedup + exports: single-threaded tail, scales with cell count
    #
    #   projected = max(device_scaled, host_scaled) + tail_scaled
    #   (device and host overlap in the pipeline; the slower one binds)
    scale = (100_000 / args.size) ** 2
    host_workers = max(1, min(32, args.host_vcpus))
    dev_s = stages.get("device", wall)
    post_s = stages.get("host_post", 0.0)
    read_s = max(stages.get("stream", 0.0) - dev_s, 0.0)
    tail_s = stages.get("dedup_and_geojson", 0.0) + max(
        stages.get("tail", 0.0), 0.0
    )
    device_scaled = dev_s * scale / 8.0
    host_scaled = (post_s + read_s) * scale / host_workers
    tail_scaled = tail_s * scale  # single-threaded, scales with cells
    proj_s = max(device_scaled, host_scaled) + tail_scaled
    report = {
        "slide_px": args.size,
        "slide_gb": round(os.path.getsize(slide_path) / 1e9, 2),
        "n_tiles": n_tiles,
        "n_cells": n_cells,
        "wall_minutes": round(minutes, 2),
        "tiles_per_sec": round(n_tiles / wall, 3),
        "pipeline_seconds": round(result.get("seconds", 0.0), 1),
        "stage_seconds": stages,
        "host_polygon_cells_per_sec": round(
            n_cells / post_s, 1
        ) if post_s > 0 else None,
        "projection": {
            "area_scale": round(scale, 3),
            "device_s_x_scale_over_8chips": round(device_scaled, 1),
            "host_s_x_scale_over_workers": round(host_scaled, 1),
            "assumed_host_workers": host_workers,
            "serial_tail_s_x_scale": round(tail_scaled, 1),
            "model": "max(device, host) + tail",
        },
        "projected_100k_v5e8_minutes": round(proj_s / 60.0, 1),
    }
    (out / "bench_slide.json").write_text(json.dumps(report, indent=2))
    print(json.dumps(report))


if __name__ == "__main__":
    main()
