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
    ap.add_argument("--chip-tile-s", type=float, default=None,
                    help="chip-serial seconds per 1024² tile for the "
                    "projection's device term (default: 1/bench.py's "
                    "latest median, 3.04 tiles/s — the two-in-flight "
                    "eval_batch rate incl. transfers). The in-run "
                    "'device' stage can NOT be used for this: it sums "
                    "two infer threads' blocked-on-device wall, which "
                    "double-counts overlap and includes tunnel-link "
                    "transfer the real v5e-8 host does not pay.")
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
    #   area scale S = (100000/size)²; tiles AND cells scale with S
    #   device: chip_tile_s × n_tiles × S / 8 chips. chip_tile_s is
    #     bench.py's measured two-in-flight eval_batch rate (incl. this
    #     tunnel's transfer costs → conservative vs a real local host).
    #     The in-run "device" stage is NOT usable here: it sums two
    #     infer threads' blocked wall (double-counts their overlap).
    #   host polygons: the in-run host_post CPU-seconds (polygons +
    #     GeoJSON feature conversion, pooled per tile) × S spread over
    #     min(32, --host-vcpus) pool workers. host_post was measured on
    #     THIS 1-vCPU host while competing with the device threads, so
    #     the per-cell cost is inflated ~8x vs the solo microbench
    #     (ROADMAP: 291 ms / 900-cell tile) — i.e. this term is an
    #     upper bound. process_tile is embarrassingly parallel per
    #     tile; the 1-vCPU host cannot demonstrate the pool scaling
    #     (assumption stated, not measured).
    #   read+decode: measured stream wall (which itself includes submit
    #     backpressure → upper bound) × S over the same pool width.
    #   export (filters, centroids, GeoJSON/CSV writes): × S over
    #     min(8, workers) — serialization parallelizes byte-identically
    #     via CLASSPOSE_WRITE_WORKERS (tests/test_write_parallel.py);
    #     8 caps what concurrent writers plausibly sustain to one disk.
    #   dedup: single-threaded KD-tree, scales with cells: × S.
    #
    #   projected = max(device, host, read) + export + dedup
    #   (stream/post overlap device work in the pipeline; the slowest
    #   binds. export+dedup run after the drain: genuinely serial.)
    scale = (100_000 / args.size) ** 2
    host_workers = max(1, min(32, args.host_vcpus))
    write_workers = max(1, min(8, args.host_vcpus))
    chip_tile_s = args.chip_tile_s or (1.0 / 3.04)
    post_s = stages.get("host_post", 0.0)
    stream_s = stages.get("stream", 0.0)
    dedup_s = stages.get("dedup", stages.get("dedup_and_geojson", 0.0))
    export_s = stages.get("export", 0.0)
    device_scaled = chip_tile_s * n_tiles * scale / 8.0
    host_scaled = post_s * scale / host_workers
    read_scaled = stream_s * scale / host_workers
    export_scaled = export_s * scale / write_workers
    dedup_scaled = dedup_s * scale
    proj_s = (
        max(device_scaled, host_scaled, read_scaled)
        + export_scaled + dedup_scaled
    )
    report = {
        "slide_px": args.size,
        "slide_gb": round(os.path.getsize(slide_path) / 1e9, 2),
        "n_tiles": n_tiles,
        "n_cells": n_cells,
        "wall_minutes": round(minutes, 2),
        "tiles_per_sec": round(n_tiles / wall, 3),
        "pipeline_seconds": round(result.get("seconds", 0.0), 1),
        "stage_seconds": stages,
        "host_polygon_cells_per_sec_contended": round(
            n_cells / post_s, 1
        ) if post_s > 0 else None,
        "projection": {
            "area_scale": round(scale, 3),
            "chip_tile_s": round(chip_tile_s, 4),
            "device_s": round(device_scaled, 1),
            "host_post_s_over_workers": round(host_scaled, 1),
            "read_s_over_workers": round(read_scaled, 1),
            "assumed_host_workers": host_workers,
            "export_s_over_write_workers": round(export_scaled, 1),
            "serial_dedup_s": round(dedup_scaled, 1),
            "model": "max(device, host_post, read) + export + dedup",
        },
        "projected_100k_v5e8_minutes": round(proj_s / 60.0, 1),
    }
    (out / "bench_slide.json").write_text(json.dumps(report, indent=2))
    print(json.dumps(report))


if __name__ == "__main__":
    main()
