"""WSI inference pipeline orchestrator.

TPU-native rebuild of the reference flagship entrypoint
(predict_wsi.py:1451-1888). Same stages, re-architected for one host
driving TPU device(s):

  reader thread pool (SlideLoader.stream)          [host]
    → tile-size-bucketed batches                    [host]
    → jitted normalize→tile-net→blend→dynamics      [device, async dispatch]
    → polygon extraction thread pool                [host]
    → dedup → ROI/tissue/artefact filters → export  [host]

The reference's per-GPU worker *processes* become device-parallel execution
inside one process (see classpose_tpu.parallel for the multi-chip mesh
path); its producer/consumer queues become thread-backed generators; its
CLI flags, output filenames, and GeoJSON schema are preserved verbatim
(QuPath contract).
"""

from __future__ import annotations

import json
import os
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

from classpose_tpu.geometry import STRtree, deduplicate
from classpose_tpu.log import get_logger
from classpose_tpu.model_configs import resolve_model_config
from classpose_tpu.pipeline.outputs import (
    apply_bounds_offset_to_feature,
    calculate_cellular_densities,
    create_spatialdata_output,
    filter_cells_by_tree,
    load_roi_polygons,
    map_cells_to_roi_classes,
    polygons_to_centroids,
    to_geojson_polygon,
    write_feature_collection,
)
from classpose_tpu.pipeline.postprocess import process_tile
from classpose_tpu.pipeline.slide_loader import (
    DEFAULT_OVERLAP,
    DEFAULT_TILE_SIZE,
    SlideLoader,
)
from classpose_tpu.utils import get_geojson_output_filename

logger = get_logger(__name__)

TILE_BUCKETS = (256, 384, 512, 640, 768, 896, 1024)


def _bucket_size(n: int, buckets: tuple[int, ...] = TILE_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return int(256 * np.ceil(n / 256))


class DeviceWorker:
    """Tile consumer: normalization + tiled net + dynamics on device(s),
    mask→polygon extraction on a host thread pool.

    Multi-device execution is mesh-sharded tile parallelism (BASELINE
    config 4, replacing the reference's one-process-per-GPU tile workers,
    predict_wsi.py:1542-1592): the model's params are replicated over a
    ``tiles`` mesh once and each ``eval_batch`` call runs ONE partitioned
    program with the tile batch sharded on the leading axis — tiles ride
    ICI, not pickled process queues, and every program compiles once for
    the whole mesh. ``devices`` comes from the ``--device`` flag
    (tpu / tpu:0,1 / the reference's cuda:0,1 syntax). ``tile_batch=None``
    defaults to max(4, n_devices); models without the batched API
    (injected test oracles) fall back to per-device replicas with
    round-robin threads."""

    def __init__(
        self,
        model,
        labels: list[str] | None,
        prediction_to_slide_scale: float,
        batch_size: int = 8,
        augment: bool = False,
        niter: int = 200,
        n_post_threads: int = 4,
        flow_threshold: float = 0.4,
        cellprob_threshold: float = 0.0,
        min_size: int = 15,
        devices: list | None = None,
        qc_downsample: int = 1,
        percentile_subsample: int = 1,
        tile_batch: int | None = None,
        tile_buckets: tuple[int, ...] | None = None,
    ):
        import jax

        self.labels = labels
        self.scale = prediction_to_slide_scale
        self.batch_size = batch_size
        self.augment = augment
        self.niter = niter
        self.flow_threshold = flow_threshold
        self.cellprob_threshold = cellprob_threshold
        self.min_size = min_size
        self.qc_downsample = qc_downsample
        self.percentile_subsample = percentile_subsample
        self.tile_buckets = tuple(tile_buckets) if tile_buckets else TILE_BUCKETS
        self._pending: dict[int, list] = {}
        self._pool = ThreadPoolExecutor(max_workers=n_post_threads)
        self._futures = []
        self.n_tiles = 0
        self.n_invalid = 0
        self.infer_seconds = 0.0  # cumulative device-path time (§5.1 timers)
        # live-progress + stage-attribution counters (reference streams
        # tqdm bars off shared counters, predict_wsi.py:742-771):
        self.n_done = 0           # tiles through the device path
        self.n_cells_found = 0    # cells extracted so far (may lag)
        self.post_seconds = 0.0   # cumulative host polygon CPU-seconds
        # two inference threads update infer_seconds concurrently
        self._stats_lock = threading.Lock()

        devices = devices or [jax.devices()[0]]
        batched = hasattr(model, "eval_batch")
        if tile_batch is None or int(tile_batch) <= 0:
            # fast path by default: the per-tile eval round-trips the host
            # several times per tile; the batched program amortizes those
            # dispatches (VERDICT r1 items 2+6). 8/device: once uploads
            # are prefetched off the critical path, the larger program
            # amortizes the per-batch epilogues (pack, argmax, readback
            # latency) — measured 3.85 vs 3.55 tiles/s/chip at 4 (r4)
            tile_batch = max(8, 2 * len(devices)) if batched else 1
        self.tile_batch = max(1, int(tile_batch))
        self.models = [model]
        self.sharded = False
        if len(devices) > 1 and batched and hasattr(model, "shard_over"):
            model.shard_over(devices)
            self.sharded = model._mesh is not None
            self.tile_batch = max(self.tile_batch, len(devices))
        elif len(devices) > 1:
            for dev in devices[1:]:
                # fallback: replicate the model onto each extra device; jit
                # dispatch follows the argument placement, so each
                # replica's work runs on its own chip
                replica = type(model).__new__(type(model))
                replica.__dict__.update(model.__dict__)
                replica.params = jax.device_put(model.params, dev)
                replica._apply = (
                    lambda x, _r=replica: _r.net.apply(_r.params, x)
                )
                replica._runners = {}
                self.models.append(replica)
        # background inference threads keep the reader streaming while the
        # device (or mesh) crunches the current batch; TWO threads for the
        # batched path so batch i+1's device program dispatches (async)
        # while batch i's host post-processing runs — otherwise the chip
        # idles for the host tail of every batch. Runner compilation is
        # serialized by the model's build lock. The replica fallback gets
        # one thread per replica.
        n_infer = len(self.models) if len(self.models) > 1 else (
            2 if self.tile_batch > 1 else 0
        )
        self._infer_pool = (
            ThreadPoolExecutor(max_workers=n_infer) if n_infer else None
        )
        self._rr = 0

    def _timed_process_tile(self, *a, **kw):
        """process_tile + GeoJSON feature conversion + stage counters
        (host polygon CPU-seconds, live cell count) — the numbers behind
        both the progress bar and the slide benchmark's host-scaling
        arithmetic. Feature conversion happens HERE, in the post pool,
        so it parallelizes per tile like the polygon extraction instead
        of serializing after the drain (it was ~14 s of the 262k-cell
        32k-slide benchmark's single-threaded tail)."""
        t0 = time.time()
        cells, inv = process_tile(*a, **kw)
        feats = [to_geojson_polygon(c) for c in cells]
        with self._stats_lock:
            self.post_seconds += time.time() - t0
            self.n_cells_found += len(feats)
            self.n_done += 1
        return feats, inv

    def _run_one(self, model, tile: np.ndarray, coords, out_size: int):
        t0 = time.time()
        masks, flows, class_masks, _ = self._eval(
            model, tile, coords, out_size
        )
        with self._stats_lock:
            self.infer_seconds += time.time() - t0
        cm = (
            class_masks[:out_size, :out_size]
            if self.labels is not None
            else None
        )
        return self._pool.submit(
            self._timed_process_tile,
            masks[:out_size, :out_size],
            cm,
            (float(coords[0]), float(coords[1])),
            self.scale,
            self.labels,
        )

    def _eval(self, model, tile, coords, out_size):
        return model.eval(
            tile.astype(np.float32),
            batch_size=self.batch_size,
            augment=self.augment,
            niter=self.niter,
            flow_threshold=self.flow_threshold,
            cellprob_threshold=self.cellprob_threshold,
            min_size=self.min_size,
            # optional throughput approximations (--fast_qc): half-res
            # flow-QC recomputation and strided percentile stats. These
            # CHANGE results for thin/small instances near the flow
            # threshold, so full fidelity (1) is the default.
            qc_downsample=self.qc_downsample,
            normalize={"percentile_subsample": self.percentile_subsample},
        )

    def submit(self, tile: np.ndarray, coords, out_size: int):
        """Run inference for one tile and queue host post-processing."""
        b = _bucket_size(max(tile.shape[:2]), self.tile_buckets)
        if tile.shape[0] != b or tile.shape[1] != b:
            # edge-replicate to the bucket size: zero padding would skew
            # the percentile normalization computed over the canvas (the
            # pad region is cropped from the masks afterwards)
            tile = np.pad(
                tile,
                ((0, b - tile.shape[0]), (0, b - tile.shape[1]), (0, 0)),
                mode="edge",
            )
        self.n_tiles += 1
        if self.tile_batch > 1 and hasattr(self.models[0], "eval_batch"):
            self._pending.setdefault(b, []).append(
                (tile, coords, out_size)
            )
            if len(self._pending[b]) >= self.tile_batch:
                self._flush_bucket(b)
            return
        model = self.models[self._rr % len(self.models)]
        self._rr += 1
        if self._infer_pool is not None:
            self._futures.append(
                self._infer_pool.submit(
                    self._run_one, model, tile, coords, out_size
                )
            )
        else:
            self._futures.append(
                self._run_one(model, tile, coords, out_size)
            )

    def _flush_bucket(self, b: int):
        items = self._pending.pop(b, [])
        if not items:
            return
        model = self.models[self._rr % len(self.models)]
        self._rr += 1
        # PRE-UPLOAD the batch here, on the stream thread, instead of
        # inside eval_batch on the inference thread: a device_put issued
        # while the previous batch's program is running rides the axon
        # tunnel for ~0 extra wall, while one on the dispatch critical
        # path adds its full ~300 ms/batch (tools/bench_link2.py). The
        # dispatch itself (host staging copy + enqueue) is ~35 ms —
        # cheap relative to the ~1 s device program it hides under.
        # Mesh-sharded runs keep host tiles: eval_batch device_puts them
        # against the mesh sharding itself.
        tiles = np.stack([t for t, _, _ in items])
        n = len(items)
        if n < self.tile_batch:
            # pad partial (tail) buckets by repeating the last tile so the
            # whole slide compiles exactly ONE fused program per
            # (bucket size, tile_batch) — a fresh batch shape would mean a
            # fresh minutes-long ViT-L compile for the tail of every slide
            # (the reference keeps one compiled program per worker,
            # predict_wsi.py:726-798)
            tiles = np.concatenate(
                [tiles, np.repeat(tiles[-1:], self.tile_batch - n, axis=0)]
            )
        if (
            not self.sharded
            and len(self.models) == 1
            and getattr(model, "_runners", None) is not None
        ):
            import jax

            tiles = jax.device_put(tiles)
        if self._infer_pool is not None:
            self._futures.append(
                self._infer_pool.submit(self._run_batch, model, tiles,
                                        items)
            )
        else:
            self._futures.append(self._run_batch(model, tiles, items))

    def _run_batch(self, model, tiles, items):
        """Batched device program for a bucket of same-sized tiles
        (ClassposeModel.eval_batch, input pre-uploaded by
        :meth:`_flush_bucket`); returns a list of post-proc futures."""
        t0 = time.time()
        n = len(items)
        results = model.eval_batch(
            tiles,
            batch_size=self.batch_size,
            augment=self.augment,
            niter=self.niter,
            flow_threshold=self.flow_threshold,
            cellprob_threshold=self.cellprob_threshold,
            min_size=self.min_size,
            qc_downsample=self.qc_downsample,
            percentile_subsample=self.percentile_subsample,
        )[:n]
        with self._stats_lock:
            self.infer_seconds += time.time() - t0
        futs = []
        for (tile, coords, out_size), (masks, cm) in zip(items, results):
            futs.append(
                self._pool.submit(
                    self._timed_process_tile,
                    masks[:out_size, :out_size],
                    cm[:out_size, :out_size] if self.labels is not None
                    else None,
                    (float(coords[0]), float(coords[1])),
                    self.scale,
                    self.labels,
                )
            )
        return futs

    def collect(self) -> list[dict]:
        for b in list(self._pending):
            self._flush_bucket(b)  # drain partial batches
        cells = []

        def consume(res):
            # items may be a (cells, n_invalid) pair, a future of one, a
            # list of futures (batched path), or a future of such a list
            if isinstance(res, list):
                for r in res:
                    consume(r)
                return
            if hasattr(res, "result"):
                consume(res.result())
                return
            c, inv = res
            cells.extend(c)
            self.n_invalid += inv

        for fut in self._futures:
            consume(fut)
        if self._infer_pool is not None:
            self._infer_pool.shutdown(wait=True)
        self._pool.shutdown(wait=True)
        return cells


class ProgressReporter:
    """Live tqdm-style progress off the shared pipeline counters —
    matching the reference's UX of tqdm bars wired to manager counters
    (reference predict_wsi.py:434-457: tiles queued; :742-771: predicted
    tiles / detected / invalid cells). One daemon thread writes
    carriage-return updates to stderr; enabled when stderr is a TTY or
    CLASSPOSE_PROGRESS=1, silent otherwise (log lines still flow)."""

    def __init__(self, worker, n_total: int | None, enabled=None):
        import os
        import sys

        if enabled is None:
            env = os.environ.get("CLASSPOSE_PROGRESS")
            enabled = (
                env == "1"
                or (env != "0" and sys.stderr.isatty())
            )
        self.worker = worker
        self.n_total = n_total
        self.enabled = bool(enabled)
        self._stop = threading.Event()
        self._t0 = time.time()
        self._thread = None

    def _line(self) -> str:
        w = self.worker
        el = max(time.time() - self._t0, 1e-6)
        total = f"/{self.n_total}" if self.n_total else ""
        return (
            f"\rtiles {w.n_done}{total} predicted "
            f"({w.n_tiles} read) | {w.n_cells_found} cells "
            f"({w.n_invalid} invalid) | {w.n_done / el:.2f} tiles/s "
            f"| device {w.infer_seconds:.1f}s host {w.post_seconds:.1f}s"
        )

    def _run(self):
        import sys

        while not self._stop.wait(0.5):
            print(self._line(), end="", file=sys.stderr, flush=True)

    def __enter__(self):
        if self.enabled:
            self._thread = threading.Thread(target=self._run, daemon=True)
            self._thread.start()
        return self

    def __exit__(self, *exc):
        import sys

        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2.0)
        if self.enabled:
            print(self._line(), file=sys.stderr, flush=True)
        return False


def infer_structure(model_path: str):
    """Auto-detect (unet structure, n_classes) from the checkpoint —
    reference predict_wsi.py:1377-1419."""
    from classpose_tpu.nn.convert import infer_structure as _infer

    return _infer(model_path)


def build_model_from_config(model_config, precision: str = "bf16",
                            n_config_labels: int | None = None):
    """Construct the ClassposeModel for a resolved ModelConfig (structure
    auto-detected from the checkpoint). Reusable across slides — jit
    programs are cached per model instance, so multi-slide runs should
    build the model once."""
    structure, n_classes = infer_structure(model_config.path)
    logger.info(
        "Inferred model structure: unet=%s n_classes=%d", structure,
        n_classes,
    )
    if (
        n_config_labels is not None
        and n_classes > 1
        and n_config_labels != n_classes
    ):
        logger.warning(
            "Model has %d classes but config lists %d cell types",
            n_classes, n_config_labels,
        )
    from classpose_tpu.runner import ClassposeModel

    return ClassposeModel(
        pretrained_model=model_config.path,
        nclasses=n_classes,
        feature_transformation_structure=structure,
        precision=precision,
    )


def main(args, model_override=None) -> dict:
    """Run the full WSI pipeline; returns a small result summary dict.

    ``model_override`` lets tests inject a model implementing the
    ``eval`` contract (the reference tests use a toy net the same way,
    SURVEY §4)."""
    t_start = time.time()
    os.makedirs(args.output_folder, exist_ok=True)
    base_name = Path(args.slide_path).name.rsplit(".", 1)[0]

    from classpose_tpu.model_configs import ModelConfig

    model_config = (
        args.model_config
        if isinstance(args.model_config, ModelConfig)
        else resolve_model_config(args.model_config)
    )
    if model_override is None:
        model_config.download_if_necessary()
    labels = model_config.cell_types

    roi_tree = None
    roi_class_dict = None
    output_types = list(getattr(args, "output_type", None) or [])
    if getattr(args, "roi_geojson", None):
        need_classes = bool(
            output_types and ("csv" in output_types
                              or "spatialdata" in output_types)
        )
        loaded = load_roi_polygons(
            args.roi_geojson, group_by_class=need_classes
        )
        if need_classes:
            roi_tree, roi_class_dict = loaded
        else:
            roi_tree = loaded

    if model_override is not None:
        model = model_override
        n_classes = getattr(model, "nclasses", len(labels) + 1)
    else:
        model = build_model_from_config(
            model_config, precision=getattr(args, "precision", "bf16"),
            n_config_labels=len(labels),
        )
        n_classes = model.nclasses
    if n_classes <= 1:
        labels = None

    # ------------------------------------------------ tissue detection (QC)
    tissue_polygons = None
    tissue_features = None
    tissue_area = 0.0
    if getattr(args, "tissue_detection_model_path", None):
        from classpose_tpu.grandqc import detect_tissue_wsi

        tissue = detect_tissue_wsi(
            args.slide_path,
            model_path=args.tissue_detection_model_path,
            min_area=getattr(args, "min_area", 0),
        )
        tissue_polygons = tissue["polygons"]  # level-0 coordinates
        tissue_features = tissue["geojson"]["features"]
        tissue_area = sum(p.area for p in tissue_polygons)  # level-0 px²
        if not tissue_polygons:
            logger.warning("No tissue detected in slide. Skipping inference.")
            return {"n_cells": 0}

    # --------------------------------------------------------------- slide
    loader = SlideLoader(
        slide_path=args.slide_path,
        train_mpp=model_config.mpp,
        tile_size=getattr(args, "tile_size", DEFAULT_TILE_SIZE),
        overlap=getattr(args, "overlap", DEFAULT_OVERLAP),
        roi_tree=roi_tree,
        tissue_polygons=tissue_polygons,
        mpp_override=getattr(args, "mpp", None),
    ).open()

    from classpose_tpu.utils import get_device

    devices = get_device(getattr(args, "device", None))
    worker = DeviceWorker(
        model,
        labels,
        prediction_to_slide_scale=loader.prediction_to_slide_scale,
        batch_size=getattr(args, "batch_size", 8),
        augment=bool(getattr(args, "tta", False)),
        devices=devices,
        n_post_threads=getattr(args, "inference_threads", None) or 4,
        qc_downsample=2 if getattr(args, "fast_qc", False) else 1,
        percentile_subsample=2 if getattr(args, "fast_qc", False) else 1,
        tile_batch=getattr(args, "tile_batch", None),
    )
    if len(devices) > 1:
        logger.info(
            "Tile-parallel inference over %d devices (%s)", len(devices),
            "mesh-sharded eval_batch" if worker.sharded
            else "per-device replicas",
        )

    profile_dir = getattr(args, "profile", None)
    if profile_dir:
        import jax

        jax.profiler.start_trace(str(profile_dir))
        logger.info("jax profiler trace → %s", profile_dir)

    tile_filter = None
    if getattr(args, "filter_background_tiles", False):
        from classpose_tpu.pipeline.tile_filter import filter_tile

        tile_filter = filter_tile

    n_streamed = 0
    t_stream0 = time.time()
    with ProgressReporter(
        worker, len(getattr(loader, "coords", []) or []) or None,
        enabled=getattr(args, "progress", None),
    ):
        for tile, coords, out_size in loader.stream(
            tile_filter=tile_filter
        ):
            worker.submit(tile, coords, out_size)
            n_streamed += 1
            if n_streamed % 50 == 0:
                logger.info(
                    "tiles: %d submitted (%.2f tiles/s, device %.1fs)",
                    n_streamed, n_streamed / (time.time() - t_stream0),
                    worker.infer_seconds,
                )
        t_stream = time.time() - t_stream0
        logger.info("Processed %d tiles", n_streamed)
        # drain: in-flight device batches + post-pool futures finishing
        # after the last submit — overlapped device/host work, NOT a
        # serial tail (their costs are already in infer/post_seconds)
        t_drain0 = time.time()
        features = worker.collect()  # GeoJSON features (pooled convert)
        t_drain = time.time() - t_drain0
    if profile_dir:
        import jax

        jax.profiler.stop_trace()
    logger.info(
        "Detected %d cells (%d invalid polygons dropped); stage timers: "
        "read+infer %.1fs drain %.1fs (device-path %.1fs, host polygons "
        "%.1fs)",
        len(features), worker.n_invalid, t_stream, t_drain,
        worker.infer_seconds, worker.post_seconds,
    )

    t_dedup0 = time.time()
    features = deduplicate(features)
    t_dedup = time.time() - t_dedup0
    t_export0 = time.time()

    # ------------------------------------------------------------- filters
    if roi_tree is not None:
        features = filter_cells_by_tree(features, roi_tree, keep_inside=True)
    if tissue_polygons:
        ttree = STRtree(tissue_polygons)
        features = filter_cells_by_tree(features, ttree, keep_inside=True)

    artefact_features = None
    artefact_area = 0.0
    artefact_polygons_l0: list = []
    if getattr(args, "artefact_detection_model_path", None):
        from classpose_tpu.grandqc import detect_artefacts_wsi

        art = detect_artefacts_wsi(
            args.slide_path,
            model_path=args.artefact_detection_model_path,
            tissue_model_path=getattr(
                args, "tissue_detection_model_path", None
            ),
        )
        artefact_features = art["geojson"]["features"]
        artefact_polygons_l0 = art["polygons_level0"]
        artefact_area = sum(p.area for p in art["polygons"])  # level-0 px²
        if getattr(args, "filter_artefacts", False) and art["polygons"]:
            atree = STRtree(art["polygons_level0"])
            features = filter_cells_by_tree(
                features, atree, keep_inside=False
            )

    centroids = polygons_to_centroids(features)

    # ------------------------------------------------- bounds offset shift
    bx, by = loader.bounds_x, loader.bounds_y
    if bx or by:
        features = [
            apply_bounds_offset_to_feature(f, bx, by) for f in features
        ]
        centroids = [
            apply_bounds_offset_to_feature(f, bx, by) for f in centroids
        ]
        if tissue_features:
            tissue_features = [
                apply_bounds_offset_to_feature(f, bx, by)
                for f in tissue_features
            ]
        if artefact_features:
            artefact_features = [
                apply_bounds_offset_to_feature(f, bx, by)
                for f in artefact_features
            ]

    # --------------------------------------------------------------- write
    out = Path(args.output_folder)
    write_feature_collection(
        features, out / get_geojson_output_filename("cell_contours",
                                                    base_name)
    )
    write_feature_collection(
        centroids, out / get_geojson_output_filename("cell_centroids",
                                                     base_name)
    )
    if tissue_features is not None:
        write_feature_collection(
            tissue_features,
            out / get_geojson_output_filename("tissue_contours", base_name),
        )
    if artefact_features is not None:
        write_feature_collection(
            artefact_features,
            out / get_geojson_output_filename("artefact_contours", base_name),
        )

    densities = None
    if output_types and labels is not None:
        if roi_class_dict:
            cells_by_roi = map_cells_to_roi_classes(
                features, roi_class_dict,
                getattr(args, "roi_class_priority", None),
            )
            tissue_by_roi = {
                k: sum(p.area for p in v) for k, v in roi_class_dict.items()
            }
            # per-ROI artefact correction: effective area = ROI − artefact∩ROI
            # (reference predict_wsi.py:1810-1824)
            from classpose_tpu.geometry import intersection_area

            artefact_by_roi = {
                k: sum(
                    intersection_area(ap, rp)
                    for ap in artefact_polygons_l0
                    for rp in v
                )
                for k, v in roi_class_dict.items()
            }
            densities = calculate_cellular_densities(
                cells_by_roi, tissue_by_roi, artefact_by_roi,
                loader.mpp[0], loader.mpp[1], labels,
            )
        else:
            densities = calculate_cellular_densities(
                features,
                tissue_area if tissue_area else _slide_area(loader),
                artefact_area,
                loader.mpp[0], loader.mpp[1], labels,
            )
        if "csv" in output_types:
            densities.to_csv(
                out / f"{base_name}_cellular_densities.csv", index=False
            )
    if output_types and "spatialdata" in output_types:
        roi_features = None
        if getattr(args, "roi_geojson", None):
            with open(args.roi_geojson) as f:
                roi_features = json.load(f).get("features")
        create_spatialdata_output(
            out / f"{base_name}_spatialdata.zarr",
            features,
            tissue_features,
            artefact_features,
            roi_features,
            densities,
            metadata={
                "slide": str(args.slide_path),
                "mpp": loader.mpp,
                "model_config": str(args.model_config),
                "n_cells": len(features),
                "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
            },
        )

    loader.close()
    dt = time.time() - t_start
    logger.info(
        "Pipeline finished: %d cells in %.1fs (%.2f tiles/s)",
        len(features), dt, n_streamed / dt if dt > 0 else 0,
    )
    return {
        "n_cells": len(features),
        "n_tiles": n_streamed,
        "seconds": dt,
        "features": features,
        # per-stage attribution for benchmarks / host-scaling analysis:
        # stream = read+submit wall and drain = post-submit finish wall —
        # BOTH are walls over overlapped device+host work, not serial
        # stages; device = cumulative seconds infer threads spend blocked
        # on eval_batch (includes h2d/readback and both-threads-in-flight
        # overlap, so it over-counts chip-serial time); host_post =
        # cumulative polygon+feature-convert CPU-seconds across the post
        # pool; dedup and export are the genuinely single-threaded tail
        # (export = filters + centroid derivation + GeoJSON/CSV/zarr
        # writes, which parallelize via CLASSPOSE_WRITE_WORKERS).
        "stage_seconds": {
            "stream": round(t_stream, 3),
            "drain": round(t_drain, 3),
            "device": round(worker.infer_seconds, 3),
            "host_post": round(worker.post_seconds, 3),
            "dedup": round(t_dedup, 3),
            "export": round(time.time() - t_export0, 3),
        },
    }


def _slide_area(loader: SlideLoader) -> float:
    W, H = loader.slide.level_dimensions[0]
    return float(W) * float(H)
