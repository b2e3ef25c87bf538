"""ClassposeModel: the single-image / list segmentation API.

Functional equivalent of the reference ``ClassposeModel`` wrapper
(models.py:233-827): precision resolution, network construction + weight
loading, ``eval`` (convert → normalize → tiled net → resample →
flow-dynamics masks → per-instance class majority vote), and the
``compute_class_masks`` vectorized majority vote (models.py:191-230).

TPU notes: precision "bf16" is native; "fp16" is mapped to bf16 with a
warning (TPUs have no fp16 MXU path — the reference's own bf16→fp16
fallback logic at models.py:37-69 exists for the inverse reason on CUDA).
"""

from __future__ import annotations

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from classpose_tpu.dynamics import compute_masks as _dyn_compute_masks
from classpose_tpu.log import get_logger
from classpose_tpu.nn import ClassTransformer, ClassTransformerConfig
from classpose_tpu.ops.normalize import NORMALIZE_DEFAULT, normalize_img
from classpose_tpu.runner.core import TileRunner, chunk_plan

models_logger = get_logger(__name__)
logger = models_logger

PRECISION_DTYPES = {"fp32": "float32", "bf16": "bfloat16", "fp16": "bfloat16"}

# column count of the one-hot segment-reduce QC (dynamics/masks.py
# qc_filter_masks_fused). 4096 covers the densest real histology tiles
# (~4000 nuclei on a 1024² tile at 0.25 MPP in tumor regions); tiles that
# still overflow are detected from the device-computed seed count and
# re-run through the unbounded scatter QC.
QC_MAX_INSTANCES = 4096


def qc_max_instances(tile_px: int) -> int:
    """Instance ceiling of the one-hot QC, scaled to the tile area.

    The sliding-window sweeps make the QC's pixel cost independent of K
    (only the K-sized per-instance tables grow, which is noise), so
    larger production tiles — where nuclei counts scale with area —
    simply get more columns. Density basis: ~4000 nuclei/Mpx is the
    densest real histology at 0.25 MPP (tumor sheets); rounded up to the
    next power of two so the packed int16 readback's class/id bit split
    (:func:`_pack_class_in_labels`) stays byte-aligned.

    Capped at 8192: beyond that the packed class⋅id int16 readback
    would need >13 id bits and fall back to a separate one-byte class
    plane (+50% d2h bytes on EVERY tile) — a worse trade than routing
    the rare >8191-instance tile through the scatter-QC redo."""
    k = QC_MAX_INSTANCES
    while k < 4000 * (tile_px / 1_048_576.0) and k < 8192:
        k *= 2
    return k


def resolve_precision(precision: str) -> str:
    """Resolve a precision flag to a JAX dtype name (models.py:37-69)."""
    if precision not in PRECISION_DTYPES:
        raise ValueError(
            f"Unknown precision '{precision}'. Expected one of "
            f"{sorted(PRECISION_DTYPES)}."
        )
    if precision == "fp16":
        models_logger.warning(
            "fp16 has no hardware path on TPU; using bf16 instead."
        )
    dtype = PRECISION_DTYPES[precision]
    models_logger.info("Using inference precision: %s (%s)", precision, dtype)
    return dtype


def convert_image(x: np.ndarray, channel_axis: int | None = None) -> np.ndarray:
    """Normalize an image array to (Ly, Lx, 3) float32 (cellpose
    ``transforms.convert_image`` behavior at models.py:615-625): channel
    axis inferred as the smallest axis ≤ 5 when not given; grayscale is
    replicated, 2-channel zero-padded, >3 channels truncated to the first 3.
    """
    x = np.asarray(x)
    if x.ndim == 2:
        x = x[:, :, None]
    elif x.ndim == 3:
        if channel_axis is None:
            sizes = x.shape
            candidates = [i for i, s in enumerate(sizes) if s <= 5]
            channel_axis = (
                min(candidates, key=lambda i: sizes[i]) if candidates
                else int(np.argmin(sizes))
            )
        x = np.moveaxis(x, channel_axis, -1)
    else:
        raise ValueError(f"expected 2D/3D image, got shape {x.shape}")
    c = x.shape[-1]
    if c == 1:
        x = np.repeat(x, 3, axis=-1)
    elif c == 2:
        x = np.concatenate([x, np.zeros_like(x[..., :1])], axis=-1)
    elif c > 3:
        x = x[..., :3]
    return np.ascontiguousarray(x, np.float32)


def convert_image_stack(x: np.ndarray) -> np.ndarray:
    """(Lz, ..., C?) stack → (Lz, Ly, Lx, 3) float32."""
    return np.stack([convert_image(p) for p in x])


def _id_bits(max_instances: int) -> int:
    """Bits of the packed int16 readback that carry the instance id:
    ids occupy the low bits (values ≤ max_instances − 1 after the host
    redo threshold), the class plane the remaining high bits."""
    return max(12, (int(max_instances) - 1).bit_length())


def _pack_fused_outputs(class_pix, raw, n_inst, win_ok, ncls,
                        max_instances=QC_MAX_INSTANCES):
    """Pack the fused eval_batch outputs into ONE (B, nbytes) uint8 buffer.

    The axon tunnel charges ~90 ms of round-trip latency PER device→host
    transfer regardless of size; the four per-batch result arrays cost
    ~4 round trips when fetched separately. Packing them into a single
    buffer (explicit little-endian byte arithmetic — endianness-neutral
    across backends, unlike bitcast_convert_type) makes the readback one
    transfer. The class-argmax plane is omitted entirely for
    single-class models (it is all zeros there).

    When the labels are dense int16 and 2 ≤ ncls ≤ 16 the class plane is
    folded INTO the label int16 as (class << 12) | id — 2 bytes/px
    instead of 3, worth ~60 ms/batch at the tunnel's ~60 MB/s (d2h of
    12.6 vs 8.4 MB measured 205 vs 146 ms). Ids need ≤ 12 bits: tiles
    with n_inst ≥ 4096 wrap, but the host already re-runs any such tile
    through the unbounded scatter path (the packed format drops the redo
    threshold to 4095), so wrapped ids are never consumed.
    """
    import jax.numpy as jnp

    B = raw.shape[0]
    pack_class = _pack_class_in_labels(
        raw.dtype == jnp.int16, ncls, max_instances
    )
    nb = 2 if raw.dtype == jnp.int16 else 4
    r = raw.astype(jnp.int32).reshape(B, -1)
    if pack_class:
        ib = _id_bits(max_instances)
        c = class_pix.astype(jnp.int32).reshape(B, -1)
        r = (c << ib) | (r & ((1 << ib) - 1))
    # bytes INTERLEAVED per pixel (lo, hi, ...) = little-endian int16/32
    # memory layout, so the host unpack is a zero-copy .view() instead of
    # per-byte shift/or passes over the 1M-px planes (which measured
    # ~300 ms/4-tile batch on the 1-CPU bench host — critical-path time,
    # since unpack runs between readback and post-processing)
    parts = [
        jnp.stack(
            [((r >> (8 * k)) & 0xFF).astype(jnp.uint8) for k in range(nb)],
            axis=2,
        ).reshape(B, -1)
    ]
    if ncls > 1 and not pack_class:
        assert class_pix.dtype == jnp.int8, class_pix.dtype  # one byte/px
        parts.append(class_pix.astype(jnp.uint8).reshape(B, -1))
    ni = n_inst.astype(jnp.int32)
    parts.append(
        jnp.stack(
            [((ni >> (8 * k)) & 0xFF).astype(jnp.uint8) for k in range(4)],
            axis=1,
        )
    )
    parts.append(win_ok.astype(jnp.uint8)[:, None])
    return jnp.concatenate(parts, axis=1)


def _pack_class_in_labels(
    raw_int16: bool, ncls: int, max_instances: int = QC_MAX_INSTANCES
) -> bool:
    """True when the fused readback folds the class plane into the dense
    int16 labels as (class << id_bits) | id — see
    :func:`_pack_fused_outputs`. Needs the class values (< ncls) to fit
    the 16 − id_bits high bits; larger-K tiles with many classes fall
    back to a separate one-byte class plane."""
    return raw_int16 and 2 <= ncls <= (1 << (16 - _id_bits(max_instances)))


def _unpack_fused_outputs(buf: np.ndarray, S: int, raw_int16: bool, ncls: int,
                          max_instances: int = QC_MAX_INSTANCES):
    """Host-side inverse of :func:`_pack_fused_outputs` — views into the
    readback buffer (the little-endian byte interleave is done on
    device); the packed-class format adds one mask/shift pass over the
    2-byte plane (a few ms/batch, far cheaper than the 4 MB it saves on
    the tunnel)."""
    B = buf.shape[0]
    npx = S * S
    nb = 2 if raw_int16 else 4
    o = nb * npx
    if _pack_class_in_labels(raw_int16, ncls, max_instances):
        ib = _id_bits(max_instances)
        v = buf[:, :o].view(np.uint16).reshape(B, S, S)
        raw = (v & ((1 << ib) - 1)).astype(np.int16)
        class_pix = (v >> ib).astype(np.int8)
    else:
        raw = (
            buf[:, :o]
            .view(np.int16 if raw_int16 else np.int32)
            .reshape(B, S, S)
        )
        if ncls > 1:
            class_pix = buf[:, o : o + npx].view(np.int8).reshape(B, S, S)
            o += npx
        else:
            class_pix = None
    n_inst = buf[:, o : o + 4].view(np.int32).ravel()
    win_ok = buf[:, o + 4].astype(bool)
    return class_pix, raw, n_inst, win_ok


def compute_class_masks_from_pixels(
    masks: np.ndarray, pixel_cls: np.ndarray, n_classes: int
) -> np.ndarray:
    """Majority vote from a precomputed pixelwise class-argmax map —
    the device computes the argmax (so only an int8 map crosses the
    host↔device link instead of full logits); the vote itself is the same
    bincount over the combined (instance, class) index.

    Native C++ core when available (one counts pass + row argmax +
    lookup, ~10x over the numpy temporaries at 1M px — this runs per
    tile on the pipeline's host path); numpy fallback is identical and
    pins it in tests."""
    from classpose_tpu.native import load_geomfast

    lib = load_geomfast()
    if lib is not None and n_classes <= 127:  # class values must fit int8
        import ctypes

        m = np.ascontiguousarray(masks, np.int32)
        c = np.ascontiguousarray(pixel_cls, np.int8)
        out = np.empty_like(m)
        lib.class_vote(
            m.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            c.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            m.size, int(n_classes),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return out
    inst = masks.ravel()
    cls = pixel_cls.ravel().astype(np.int64)
    max_inst = int(inst.max())
    valid = inst > 0
    idx = inst[valid].astype(np.int64) * n_classes + cls[valid]
    counts = np.bincount(idx, minlength=(max_inst + 1) * n_classes)
    counts = counts.reshape(max_inst + 1, n_classes)
    major = counts.argmax(axis=1)
    major[0] = 0
    return major[masks]


def compute_class_masks(
    masks: np.ndarray, y_class: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Per-instance majority class vote (reference models.py:191-230):
    pixelwise argmax of class logits, then bincount over the combined
    (instance, class) index."""
    squeezed = np.squeeze(y_class)
    pixel_cls = squeezed.argmax(axis=0)
    n_classes = int(squeezed.shape[0])
    class_masks = compute_class_masks_from_pixels(
        masks, pixel_cls, n_classes
    )
    return class_masks, np.unique(masks)


def dx_to_circ(dP: np.ndarray) -> np.ndarray:
    """Flow field → HSV-style RGB visualization (cellpose ``plot.dx_to_circ``
    used in the eval return tuple, models.py:824)."""
    dP = np.asarray(dP, np.float32)
    mag = np.clip(np.sqrt(np.sum(dP**2, axis=0)), 0, 1e6)
    mag = mag / (mag.max() + 1e-12)
    ang = (np.arctan2(dP[0], dP[1]) + np.pi) / (2 * np.pi)
    H, W = mag.shape
    hsv = np.stack([ang, np.ones_like(mag), mag], axis=-1)
    # vectorized hsv→rgb
    h6 = hsv[..., 0] * 6.0
    i = np.floor(h6).astype(int) % 6
    f = h6 - np.floor(h6)
    v = hsv[..., 2]
    p = np.zeros_like(v)
    q = v * (1 - f)
    t = v * f
    rgb = np.zeros((H, W, 3), np.float32)
    conds = [
        (v, t, p), (q, v, p), (p, v, t), (p, q, v), (t, p, v), (v, p, q),
    ]
    for k, (r, g, b) in enumerate(conds):
        m = i == k
        rgb[m, 0], rgb[m, 1], rgb[m, 2] = r[m], g[m], b[m]
    return (rgb * 255).astype(np.uint8)


def _resize_chw(arr: np.ndarray, Ly: int, Lx: int, nearest=False) -> np.ndarray:
    """Resize (C, H, W) or (H, W) arrays with jax.image (device-side);
    no-op when the spatial shape already matches."""
    if np.asarray(arr).shape[-2:] == (Ly, Lx):
        return np.asarray(arr)
    a = jnp.asarray(arr)
    method = "nearest" if nearest else "linear"
    if a.ndim == 2:
        out = jax.image.resize(a, (Ly, Lx), method)
    else:
        out = jax.image.resize(a, (a.shape[0], Ly, Lx), method)
    return np.asarray(out)


class ClassposeModel:
    """Classpose model: network + tiled inference + mask dynamics.

    Weight sources: a ``.npz`` flat-param file produced by
    :mod:`classpose_tpu.nn.convert`, a torch ``.pt`` state dict (converted
    on the fly when torch is installed), or ``None`` for random init (tests).
    """

    def __init__(
        self,
        pretrained_model: str | None = None,
        nclasses: int | None = None,
        feature_transformation_structure=None,
        precision: str = "fp32",
        cfg: ClassTransformerConfig | None = None,
        params=None,
    ):
        self.precision = precision
        dtype = resolve_precision(precision)
        if cfg is None:
            cfg = ClassTransformerConfig(
                n_cell_classes=nclasses or 1,
                feature_transformation_structure=(
                    tuple(feature_transformation_structure)
                    if feature_transformation_structure
                    else None
                ),
                dtype=dtype,
            )
        else:
            cfg = ClassTransformerConfig(
                **{**cfg.__dict__, "dtype": dtype}
            )
        self.cfg = cfg
        self.nclasses = cfg.n_cell_classes
        self.net = ClassTransformer(cfg)
        self.timing: list[float] = []

        if params is not None:
            self.params = params
        elif pretrained_model is not None:
            models_logger.info(f"loading model {pretrained_model}")
            if str(pretrained_model).endswith(".npz"):
                from classpose_tpu.nn.convert import load_npz_checkpoint

                self.params, meta = load_npz_checkpoint(pretrained_model)
                if meta is not None:
                    meta = dict(meta)
                    meta["dtype"] = dtype
                    if meta.get("feature_transformation_structure"):
                        meta["feature_transformation_structure"] = tuple(
                            meta["feature_transformation_structure"]
                        )
                    cfg = ClassTransformerConfig(**meta)
                    self.cfg = cfg
                    self.nclasses = cfg.n_cell_classes
                    self.net = ClassTransformer(cfg)
            else:
                from classpose_tpu.nn.convert import load_params

                self.params = load_params(pretrained_model, cfg)
        else:
            models_logger.warning(
                "no pretrained model given — randomly initialized network"
            )
            if cfg.depth >= 12:
                # large nets: materialize zeros from shapes (a traced
                # net.init on the TPU takes minutes for ViT-L)
                shapes = jax.eval_shape(
                    lambda: self.net.init(
                        jax.random.PRNGKey(0),
                        jnp.zeros((1, 3, cfg.bsize, cfg.bsize)),
                    )
                )
                self.params = jax.tree_util.tree_map(
                    lambda s: jnp.zeros(s.shape, s.dtype), shapes
                )
            else:
                self.params = self.net.init(
                    jax.random.PRNGKey(0),
                    jnp.zeros((1, 3, cfg.bsize, cfg.bsize)),
                )

        self._apply = lambda x: self.net.apply(self.params, x)
        self._runners: dict = {}
        # guards runner construction when concurrent pipeline threads
        # race to compile the same program (calls are thread-safe once
        # built; jitted executables are)
        self._build_lock = threading.Lock()
        self._mesh = None
        self._tile_sharding = None
        self._replicated = None

    def shard_over(self, devices) -> "ClassposeModel":
        """Enable tile-parallel execution of :meth:`eval_batch` over a
        device mesh (BASELINE config 4; the TPU-native form of the
        reference's one-process-per-GPU tile workers,
        predict_wsi.py:1542-1592).

        Params are replicated onto every device ONCE; eval_batch inputs
        are then sharded on the leading (tile) axis and GSPMD partitions
        the vmapped per-tile program — tiles ride ICI, params never move
        again, and each program compiles once for the whole mesh instead
        of once per replica."""
        import numpy as _np
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        devices = list(devices)
        if len(devices) <= 1:
            self._mesh = None
            return self
        mesh = Mesh(_np.array(devices), ("tiles",))
        self._mesh = mesh
        self._tile_sharding = NamedSharding(mesh, P("tiles"))
        self._replicated = NamedSharding(mesh, P())
        self.params = jax.device_put(self.params, self._replicated)
        self._apply = lambda x: self.net.apply(self.params, x)
        self._runners = {}
        return self

    def _get_runner(self, batch_size, augment, tile_overlap, bsize):
        key = (batch_size, augment, tile_overlap, bsize)
        if key not in self._runners:
            self._runners[key] = TileRunner(
                self._apply,
                self.nclasses,
                bsize=bsize,
                batch_size=batch_size,
                tile_overlap=tile_overlap,
                augment=augment,
            )
        return self._runners[key]

    def eval(
        self,
        x,
        batch_size: int = 8,
        resample: bool = True,
        channel_axis: int | None = None,
        normalize=True,
        invert: bool = False,
        diameter: float | None = None,
        flow_threshold: float = 0.4,
        cellprob_threshold: float = 0.0,
        min_size: int = 15,
        max_size_fraction: float = 0.4,
        niter: int | None = None,
        augment: bool = False,
        tile_overlap: float = 0.1,
        bsize: int | None = None,
        compute_masks: bool = True,
        qc_downsample: int = 1,
        do_3D: bool = False,
        stitch_threshold: float = 0.0,
        anisotropy: float | None = None,
        **_unused,
    ):
        """Segment an image, a list of images, or a 3D stack (reference
        models.py:478-827). Returns ``(masks, flows, class_masks, styles)``
        with flows = (dx_to_circ(dP), dP, cellprob, y_class, input_shape).

        3D: ``do_3D=True`` runs the net over orthogonal plane stacks and
        recovers instances with 3D dynamics; ``stitch_threshold>0`` instead
        segments each plane in 2D and links instances across planes by IoU
        (reference models.py:97-188).
        """
        if bsize is None:
            bsize = self.cfg.bsize
        if do_3D or stitch_threshold > 0:
            return self._eval_3d(
                x, batch_size=batch_size, normalize=normalize,
                invert=invert, flow_threshold=flow_threshold,
                cellprob_threshold=cellprob_threshold, min_size=min_size,
                niter=niter, augment=augment, tile_overlap=tile_overlap,
                bsize=bsize, do_3D=do_3D,
                stitch_threshold=stitch_threshold, anisotropy=anisotropy,
            )
        if isinstance(x, list):
            self.timing = []
            results = ([], [], [], [])
            for xi in x:
                tic = time.time()
                mi, fi, ci, si = self.eval(
                    xi,
                    batch_size=batch_size,
                    resample=resample,
                    channel_axis=channel_axis,
                    normalize=normalize,
                    invert=invert,
                    diameter=diameter,
                    flow_threshold=flow_threshold,
                    cellprob_threshold=cellprob_threshold,
                    min_size=min_size,
                    max_size_fraction=max_size_fraction,
                    niter=niter,
                    augment=augment,
                    tile_overlap=tile_overlap,
                    bsize=bsize,
                    compute_masks=compute_masks,
                    qc_downsample=qc_downsample,
                )
                for acc, v in zip(results, (mi, fi, ci, si)):
                    acc.append(v)
                self.timing.append(time.time() - tic)
            return results

        img = convert_image(x, channel_axis=channel_axis)
        Ly0, Lx0 = img.shape[:2]

        image_scaling = None
        if diameter is not None and diameter > 0:
            image_scaling = 30.0 / diameter
            img = np.asarray(
                jax.image.resize(
                    jnp.asarray(img),
                    (
                        int(Ly0 * image_scaling),
                        int(Lx0 * image_scaling),
                        img.shape[-1],
                    ),
                    "linear",
                )
            )

        norm_params = dict(NORMALIZE_DEFAULT)
        if isinstance(normalize, dict):
            norm_params.update(normalize)
        elif isinstance(normalize, bool):
            norm_params["normalize"] = normalize
            norm_params["invert"] = invert
        else:
            raise ValueError("normalize parameter must be a bool or a dict")
        if norm_params["normalize"]:
            img = np.asarray(
                normalize_img(
                    jnp.asarray(img),
                    axis=-1,
                    lowhigh=norm_params["lowhigh"],
                    percentile=norm_params["percentile"],
                    invert=norm_params["invert"],
                    sharpen_radius=norm_params["sharpen_radius"],
                    smooth_radius=norm_params["smooth_radius"],
                    tile_norm_blocksize=norm_params["tile_norm_blocksize"],
                    percentile_subsample=norm_params[
                        "percentile_subsample"
                    ],
                )
            )

        runner = self._get_runner(batch_size, augment, tile_overlap, bsize)
        out = runner(jnp.asarray(img.transpose(2, 0, 1)))
        y = np.asarray(out["y"])  # (3, Ly, Lx)
        dP = y[:2]
        cellprob = y[2]
        y_class = (
            np.asarray(out["y_class"]) if self.nclasses > 1 else
            np.zeros((1,) + cellprob.shape, np.float32)
        )
        styles = np.asarray(out["style"])

        if resample and (dP.shape[1:] != (Ly0, Lx0)):
            dP = _resize_chw(dP, Ly0, Lx0)
            cellprob = _resize_chw(cellprob, Ly0, Lx0)
            y_class = _resize_chw(y_class, Ly0, Lx0)

        if compute_masks:
            niter0 = 200
            niter_eff = niter0 if niter is None or niter == 0 else niter
            # keep dynamics on the same device as the params (multi-device
            # tile parallelism places replicas on different chips)
            leaves = jax.tree_util.tree_leaves(self.params)
            dev = None
            if leaves:
                ds = getattr(leaves[0], "devices", None)
                if callable(ds):
                    try:
                        dev = next(iter(ds()))
                    except Exception:
                        dev = None
            masks = _dyn_compute_masks(
                dP,
                cellprob,
                niter=niter_eff,
                cellprob_threshold=cellprob_threshold,
                flow_threshold=flow_threshold,
                min_size=min_size,
                max_size_fraction=max_size_fraction,
                qc_downsample=qc_downsample,
                device=dev,
            )
            # majority vote at the resolution masks were computed at
            # (y_class matches dP resolution), THEN resize label maps
            if self.nclasses > 1:
                class_masks, _ = compute_class_masks(masks, y_class)
            else:
                class_masks = np.zeros_like(masks)
            if not resample and masks.shape != (Ly0, Lx0):
                masks = _resize_chw(masks.astype(np.int32), Ly0, Lx0,
                                    nearest=True)
                class_masks = _resize_chw(
                    class_masks.astype(np.int32), Ly0, Lx0, nearest=True
                )
        else:
            masks = np.zeros(0)
            class_masks = np.zeros(0)

        if image_scaling is not None and compute_masks:
            masks = _resize_chw(masks.astype(np.int32), Ly0, Lx0, nearest=True)
            class_masks = _resize_chw(
                class_masks.astype(np.int32), Ly0, Lx0, nearest=True
            )
            dP = _resize_chw(dP, Ly0, Lx0)
            cellprob = _resize_chw(cellprob, Ly0, Lx0)
            y_class = _resize_chw(y_class, Ly0, Lx0)

        return (
            masks,
            (dx_to_circ(dP), dP, cellprob, y_class, img.shape),
            class_masks,
            styles,
        )

    def _eval_3d(
        self,
        x,
        batch_size,
        normalize,
        invert,
        flow_threshold,
        cellprob_threshold,
        min_size,
        niter,
        augment,
        tile_overlap,
        bsize,
        do_3D,
        stitch_threshold,
        anisotropy,
    ):
        """3D segmentation: plane-aggregated flows + 3D dynamics (do_3D) or
        per-plane 2D masks linked by IoU (stitch_threshold)."""
        from classpose_tpu.runner.run3d import (
            compute_masks_3d,
            run_3D,
            stitch3D,
        )

        x = np.asarray(x, np.float32)
        if x.ndim == 3:
            x = np.repeat(x[..., None], 3, axis=-1)
        if x.shape[-1] != 3:
            x = convert_image_stack(x)
        Lz, Ly, Lx = x.shape[:3]

        if anisotropy and anisotropy != 1.0 and do_3D:
            x = np.asarray(
                jax.image.resize(
                    jnp.asarray(x),
                    (int(Lz * anisotropy), Ly, Lx, 3), "linear",
                )
            )
            Lz = x.shape[0]

        norm_params = dict(NORMALIZE_DEFAULT)
        if isinstance(normalize, dict):
            norm_params.update(normalize)
        else:
            norm_params["normalize"] = bool(normalize)
            norm_params["invert"] = invert
        if norm_params["normalize"]:
            # norm3D: stats across the whole stack (reference
            # models.py:651-666)
            x = np.asarray(
                normalize_img(
                    jnp.asarray(x), axis=-1,
                    lowhigh=norm_params["lowhigh"],
                    percentile=norm_params["percentile"],
                    invert=norm_params["invert"],
                )
            )

        niter_eff = 200 if niter is None or niter == 0 else niter

        if do_3D:
            yf, y_classf, _ = run_3D(
                self._apply, x, n_cell_classes=self.nclasses,
                batch_size=batch_size, augment=augment,
                tile_overlap=tile_overlap, bsize=bsize,
            )
            cellprob = yf[..., -1]
            dP = yf[..., :-1].transpose(3, 0, 1, 2)  # (3, Lz, Ly, Lx)
            masks = compute_masks_3d(
                dP, cellprob, niter=niter_eff,
                cellprob_threshold=cellprob_threshold,
                flow_threshold=flow_threshold, min_size=min_size,
            )
            y_class = (
                y_classf.transpose(3, 0, 1, 2)
                if y_classf is not None
                else np.zeros((1,) + cellprob.shape, np.float32)
            )
        else:
            # per-plane 2D masks + IoU stitching
            from classpose_tpu.runner.core import run_net

            yf, y_classf, _ = run_net(
                self._apply, x, n_cell_classes=self.nclasses,
                batch_size=batch_size, augment=augment,
                tile_overlap=tile_overlap, bsize=bsize,
            )
            cellprob = yf[..., -1]
            dP = yf[..., :2].transpose(3, 0, 1, 2)
            planes = []
            for z in range(Lz):
                planes.append(
                    _dyn_compute_masks(
                        dP[:, z], cellprob[z], niter=niter_eff,
                        cellprob_threshold=cellprob_threshold,
                        flow_threshold=flow_threshold,
                        min_size=-1,  # min_size off pre-stitch (reference)
                    )
                )
            masks = stitch3D(
                np.stack(planes), stitch_threshold=stitch_threshold
            )
            if min_size > 0 and masks.max() > 0:
                counts = np.bincount(masks.ravel())
                small = counts < min_size
                small[0] = False
                masks[small[masks]] = 0
            y_class = (
                y_classf.transpose(3, 0, 1, 2)
                if y_classf is not None
                else np.zeros((1,) + cellprob.shape, np.float32)
            )

        if self.nclasses > 1 and masks.max():
            class_masks, _ = compute_class_masks(masks, y_class)
        else:
            class_masks = np.zeros_like(masks)
        return (
            masks,
            (None, dP, cellprob, y_class, x.shape),
            class_masks,
            np.zeros(256, np.float32),
        )

    # ------------------------------------------------------------ batched API

    def eval_batch(
        self,
        tiles: np.ndarray,
        batch_size: int = 8,
        augment: bool = False,
        niter: int = 200,
        flow_threshold: float = 0.4,
        cellprob_threshold: float = 0.0,
        min_size: int = 15,
        max_size_fraction: float = 0.4,
        qc_downsample: int = 1,
        percentile_subsample: int = 1,
    ) -> list[tuple[np.ndarray, np.ndarray]]:
        """Segment a batch of same-sized tiles in ONE device program for
        everything up to host-side relabeling.

        The per-tile :meth:`eval` round-trips the host several times per
        tile (normalize → forward → resample → dynamics); at production
        throughput those dispatches dominate. This path vmaps
        normalization, the tiled forward, Euler integration, and seed
        clustering over the batch, so the device sees one program per
        batch and the host does only per-tile relabel/QC/majority-vote.

        Args: tiles (B, S, S, 3) float32 at model MPP. Returns a list of
        (masks, class_masks) int32 arrays.

        When :meth:`shard_over` armed a mesh, the batch is padded to a
        multiple of the mesh size (repeating the last tile — zero tiles
        would skew nothing but waste identical compute) and sharded on the
        leading axis; per-tile programs are independent along B, so the
        partitioned run is bit-identical to the single-device one.

        Default fidelity (qc_downsample=1) runs the FULLY FUSED program:
        normalization, tiled forward, blending, Euler integration, seed
        clustering, max-size filter and flow-error QC all on device, with
        only int32 raw masks + an int8 class-argmax map crossing the
        host↔device link (~8× less transfer than shipping logits + flows —
        the link, not compute, dominated the previous profile). uint8 tiles
        are transferred as uint8 and converted on device.

        ``tiles`` may be a device-resident ``jax.Array`` (uint8/float32):
        the upload then happened off this thread's critical path (the
        DeviceWorker pre-uploads each bucket as it fills), and this method
        dispatches the program directly — tools/bench_link2.py measured
        that an upload issued while a program is running rides the tunnel
        for ~0 extra wall, while one on the dispatch path adds its full
        ~300 ms/batch.
        """
        if isinstance(tiles, jax.Array):
            if tiles.dtype not in (jnp.uint8, jnp.float32):
                tiles = tiles.astype(jnp.float32)
        else:
            tiles = np.ascontiguousarray(tiles)
            if tiles.dtype != np.uint8:
                tiles = np.ascontiguousarray(tiles, np.float32)
        B0 = tiles.shape[0]
        n_dev = int(self._mesh.devices.size) if self._mesh is not None else 1
        if n_dev > 1 and B0 % n_dev:
            xp = jnp if isinstance(tiles, jax.Array) else np
            tiles = xp.concatenate(
                [tiles, xp.repeat(tiles[-1:], (-B0) % n_dev, axis=0)]
            )
        B, S = tiles.shape[0], tiles.shape[1]

        if qc_downsample <= 1:
            return self._eval_batch_fused(
                tiles, B0, batch_size, augment, niter, flow_threshold,
                cellprob_threshold, min_size, max_size_fraction,
                percentile_subsample,
            )

        key = ("batched", B, S, batch_size, niter, percentile_subsample,
               cellprob_threshold, augment, str(tiles.dtype))
        if key not in self._runners:
            with self._build_lock:
                if key not in self._runners:
                    self._runners[key] = self._build_batched(
                        B, S, batch_size, niter, percentile_subsample,
                        cellprob_threshold, augment,
                    )
        xt = (
            jax.device_put(tiles, self._tile_sharding)
            if self._mesh is not None
            else jnp.asarray(tiles)
        )
        y_class, p, iscell, dP = self._runners[key](xt)

        # host per tile: cluster-id relabel + size filter; then ONE batched
        # device program recomputes the QC flows for every tile (shared
        # extent-derived niter bucket), and the host finishes with
        # per-instance error bincounts, hole filling and the class vote
        from classpose_tpu.dynamics.flows import (
            _bucket,
            _diffuse_and_grad,
            _max_instance_extent,
            instance_center_map,
        )
        from classpose_tpu.dynamics.masks import (
            densify_labels,
            fill_holes_and_remove_small_masks,
            get_masks_from_positions_batched,
        )

        raw = np.asarray(get_masks_from_positions_batched(p, iscell))
        dP_np = np.asarray(dP)
        y_class_np = np.asarray(y_class) if self.nclasses > 1 else None

        masks_list = []
        for i in range(B):
            masks = densify_labels(raw[i])
            nmax = int(masks.max())
            if nmax:
                counts = np.bincount(masks.ravel(), minlength=nmax + 1)
                too_big = counts > max_size_fraction * S * S
                too_big[0] = False
                if too_big.any():
                    masks[too_big[masks]] = 0
            masks_list.append(masks)

        if flow_threshold and flow_threshold > 0:
            d = max(1, qc_downsample)
            ms = np.stack([m[::d, ::d] for m in masks_list])
            extents = [
                _max_instance_extent(m) for m in ms
            ]
            niter_qc = _bucket(
                min(max(2 * max(extents, default=1), 40), 400), 40
            )
            cms = np.stack([instance_center_map(m) for m in ms])
            ms_dev, cms_dev = jnp.asarray(ms), jnp.asarray(cms)
            if self._mesh is not None:
                ms_dev = jax.device_put(ms, self._tile_sharding)
                cms_dev = jax.device_put(cms, self._tile_sharding)
            mu = np.asarray(
                jax.vmap(lambda a, b: _diffuse_and_grad(a, b, niter_qc))(
                    ms_dev, cms_dev
                )
            )
            dP_ds = dP_np[:, :, ::d, ::d]
            for i in range(B):
                masks = masks_list[i]
                nmax = int(masks.max())
                if nmax == 0:
                    continue
                err_map = ((mu[i] - dP_ds[i] / 5.0) ** 2).sum(axis=0)
                ids_ds = ms[i].ravel().astype(np.int64)
                fg = ids_ds > 0
                n = np.bincount(ids_ds[fg], minlength=nmax + 1)
                ssum = np.bincount(
                    ids_ds[fg], weights=err_map.ravel()[fg],
                    minlength=nmax + 1,
                )
                errs = (ssum / np.maximum(n, 1)).astype(np.float32)
                bad = errs > flow_threshold
                bad[0] = False
                if bad.any():
                    masks[bad[masks]] = 0

        out = []
        for i in range(B0):
            masks = masks_list[i]
            if masks.max():
                masks = fill_holes_and_remove_small_masks(
                    masks, min_size=min_size
                )
            if self.nclasses > 1 and masks.max():
                cm, _ = compute_class_masks(masks, y_class_np[i])
            else:
                cm = np.zeros_like(masks)
            out.append((masks, cm))
        return out

    def _eval_batch_fused(
        self, tiles, B0, batch_size, augment, niter, flow_threshold,
        cellprob_threshold, min_size, max_size_fraction,
        percentile_subsample, force_scatter_qc=False,
    ):
        from classpose_tpu.dynamics.masks import (
            densify_labels,
            fill_holes_and_remove_small_masks,
        )

        B, S = tiles.shape[0], tiles.shape[1]
        key = ("fused", B, S, batch_size, niter, percentile_subsample,
               cellprob_threshold, augment, float(flow_threshold or 0.0),
               float(max_size_fraction or 0.0), str(tiles.dtype),
               bool(force_scatter_qc))
        if key not in self._runners:
            with self._build_lock:
                if key not in self._runners:
                    self._runners[key] = self._build_batched_fused(
                        B, S, batch_size, niter, percentile_subsample,
                        cellprob_threshold, augment, flow_threshold,
                        max_size_fraction,
                        force_scatter_qc=force_scatter_qc,
                    )
        xt = (
            jax.device_put(tiles, self._tile_sharding)
            if self._mesh is not None
            else jnp.asarray(tiles)
        )
        fn, raw_int16 = self._runners[key]
        qc_k = qc_max_instances(S * S)
        # ONE packed uint8 buffer = one device→host round trip (the
        # tunnel charges ~90 ms latency per fetch; see _pack_fused_outputs).
        # copy_to_host_async starts the fetch the moment the program
        # retires instead of when np.asarray gets around to blocking, so
        # under the two-in-flight DeviceWorker the bytes stream while the
        # OTHER thread's program runs.
        buf_dev = fn(xt)
        try:
            buf_dev.copy_to_host_async()
        except (AttributeError, RuntimeError):  # backend without support
            pass
        buf = np.asarray(buf_dev)
        class_pix, raw, n_inst, win_ok = _unpack_fused_outputs(
            buf, S, raw_int16, self.nclasses, qc_k
        )

        # packed-class tiles wrap ids above the id-bit budget, so they
        # must redo at ≥ K instances (vs > K for the plain dense format)
        inst_limit = (
            qc_k - 1
            if _pack_class_in_labels(raw_int16, self.nclasses, qc_k)
            else qc_k
        )
        out = []
        for i in range(B0):
            if raw.dtype == np.int16 and (
                n_inst[i] > inst_limit or not win_ok[i]
            ):
                # the one-hot QC dropped ids beyond its K columns, or the
                # tile's id spread beat the sliding-window sweeps — redo
                # this pathological tile through the scatter-QC program,
                # which has no instance-count or locality bound
                logger.warning(
                    "tile %d has %d instances (max_instances=%d, "
                    "window_ok=%s): re-running with the unbounded "
                    "scatter QC",
                    i, int(n_inst[i]), qc_k, bool(win_ok[i]),
                )
                out.append(
                    self._eval_batch_fused(
                        tiles[i : i + 1], 1, batch_size, augment, niter,
                        flow_threshold, cellprob_threshold, min_size,
                        max_size_fraction, percentile_subsample,
                        force_scatter_qc=True,
                    )[0]
                )
                continue
            if raw.dtype == np.int16:
                # device already produced dense ascending labels
                masks = raw[i].astype(np.int32)
            else:
                masks = densify_labels(raw[i])
            if masks.max():
                masks = fill_holes_and_remove_small_masks(
                    masks, min_size=min_size
                )
            if self.nclasses > 1 and masks.max():
                cm = compute_class_masks_from_pixels(
                    masks, class_pix[i], self.nclasses
                )
            else:
                cm = np.zeros_like(masks)
            out.append((masks, cm))
        return out

    def _build_batched_fused(self, B, S, batch_size, niter,
                             percentile_subsample, cellprob_threshold,
                             augment, flow_threshold, max_size_fraction,
                             force_scatter_qc=False):
        from classpose_tpu.dynamics.masks import (
            follow_flows_batched,
            get_masks_from_positions_batched,
            qc_filter_masks,
            qc_filter_masks_fused,
        )

        # one-hot segment-reduce QC is ~10x faster than scatters on TPU
        # (no serialized 1M-index scatter/gather) but ~5x slower on CPU,
        # where scatters are cheap and the K-wide masked sweeps are not —
        # pick per backend at build time (results agree; equivalence is
        # pinned by tests/test_dynamics.py::test_qc_fused_matches_scatter).
        # CLASSPOSE_QC_ONEHOT=1/0 overrides (tests force the TPU path on
        # the CPU backend with it); force_scatter_qc is the overflow
        # fallback for tiles with more than QC_MAX_INSTANCES instances
        import os as _os

        _ov = _os.environ.get("CLASSPOSE_QC_ONEHOT")
        qc_onehot = (
            _ov == "1" if _ov in ("0", "1")
            else jax.default_backend() == "tpu"
        ) and not force_scatter_qc
        from classpose_tpu.ops.normalize import normalize_img
        from classpose_tpu.ops.tiles import (
            average_tiles_separable as average_tiles,
            compute_tile_grid,
            get_pad_yx,
            make_tiles,
            unaugment_class_tiles,
            unaugment_tiles,
        )

        bsize = self.cfg.bsize
        ncls = self.nclasses
        ypad1, ypad2, xpad1, xpad2 = get_pad_yx(S, S, (bsize, bsize))
        grid = compute_tile_grid(
            S + ypad1 + ypad2, S + xpad1 + xpad2, bsize, 0.1, augment
        )
        nt = grid.ntiles
        nchunk, bs, pad_tiles = chunk_plan(nt, batch_size)

        def per_tile(img_hwc):
            # uint8-sourced tiles take the exact histogram-percentile
            # path (no 1M-px sort); float inputs keep the sort/subsample
            img = normalize_img(
                img_hwc.astype(jnp.float32), axis=-1,
                percentile_subsample=percentile_subsample,
                integral_stats=img_hwc.dtype == jnp.uint8,
            )
            chw = jnp.transpose(img, (2, 0, 1))
            chw = jnp.pad(chw, ((0, 0), (ypad1, ypad2), (xpad1, xpad2)))
            t = make_tiles(chw, grid)
            if pad_tiles:
                t = jnp.concatenate(
                    [t, jnp.zeros((pad_tiles,) + t.shape[1:], t.dtype)]
                )
            chunks = t.reshape((nchunk, bs) + t.shape[1:])

            def fwd(chunk):
                y, _ = self._apply(chunk)
                return y

            y = jax.lax.map(fwd, chunks)
            y = y.reshape((nchunk * bs,) + y.shape[2:])[:nt]
            if ncls > 1:
                y_class, y_seg = y[:, :ncls], y[:, ncls:]
                if augment:
                    y_class = unaugment_class_tiles(y_class, grid)
                ycf = average_tiles(y_class, grid)[
                    :, ypad1 : ypad1 + S, xpad1 : xpad1 + S
                ]
                class_pix = jnp.argmax(ycf, axis=0).astype(
                    jnp.int8 if ncls <= 127 else jnp.int32
                )
            else:
                y_seg = y
                class_pix = jnp.zeros((S, S), jnp.int8)
            if augment:
                y_seg = unaugment_tiles(y_seg, grid)
            yf = average_tiles(y_seg, grid)[
                :, ypad1 : ypad1 + S, xpad1 : xpad1 + S
            ]
            dP = yf[:2]
            cellprob = yf[2]
            iscell = cellprob > cellprob_threshold
            return class_pix, dP, iscell

        def batched(x):
            # follow_flows_batched is natively batched and jitted with
            # static (niter, shift_min_size); running it outside the
            # per-tile vmap keeps one fused integration program over the
            # whole batch (the per-pass sampler choice is a static
            # trace-time branch on the displacement bound)
            class_pix, dP, iscell = jax.vmap(per_tile)(x)
            p = follow_flows_batched(dP, iscell, niter=niter)
            raw, seed_lab = get_masks_from_positions_batched(
                p, iscell, return_seeds=True
            )
            # seed ids are dense ranks, so the per-tile instance count is
            # just the max seed id — the host uses it to detect overflow
            # past the one-hot QC's K columns
            n_inst = seed_lab.max(axis=(1, 2))
            if qc_onehot:
                # dense int16 labels halve the device→host bytes and let
                # the host skip its densify pass (ascending-by-id order
                # keeps the final sequential relabeling identical);
                # window_ok=False flags tiles whose id spread beat the
                # sliding-window sweeps — host falls back like overflow
                raw, win_ok = jax.vmap(
                    lambda r, d: qc_filter_masks_fused(
                        r, d, flow_threshold=flow_threshold,
                        max_size_fraction=max_size_fraction,
                        max_instances=qc_max_instances(S * S),
                        dense_output=True,
                        return_window_ok=True,
                    )
                )(raw, dP)
            else:
                raw = jax.vmap(
                    lambda r, d: qc_filter_masks(
                        r, d, flow_threshold=flow_threshold,
                        max_size_fraction=max_size_fraction,
                    )
                )(raw, dP)
                win_ok = jnp.ones(raw.shape[0], bool)
            return _pack_fused_outputs(
                class_pix, raw, n_inst, win_ok, ncls,
                max_instances=qc_max_instances(S * S),
            )

        return jax.jit(batched), qc_onehot

    def _build_batched(self, B, S, batch_size, niter, percentile_subsample,
                       cellprob_threshold=0.0, augment=False):
        from classpose_tpu.dynamics.masks import follow_flows_batched
        from classpose_tpu.ops.normalize import normalize_img
        from classpose_tpu.ops.tiles import (
            average_tiles_separable as average_tiles,
            compute_tile_grid,
            get_pad_yx,
            make_tiles,
            unaugment_class_tiles,
            unaugment_tiles,
        )

        bsize = self.cfg.bsize
        ncls = self.nclasses
        ypad1, ypad2, xpad1, xpad2 = get_pad_yx(S, S, (bsize, bsize))
        grid = compute_tile_grid(
            S + ypad1 + ypad2, S + xpad1 + xpad2, bsize, 0.1, augment
        )
        nt = grid.ntiles
        nchunk, bs, pad_tiles = chunk_plan(nt, batch_size)

        def per_tile(img_hwc):
            # uint8-sourced tiles take the exact histogram-percentile
            # path (no 1M-px sort); float inputs keep the sort/subsample
            img = normalize_img(
                img_hwc.astype(jnp.float32), axis=-1,
                percentile_subsample=percentile_subsample,
                integral_stats=img_hwc.dtype == jnp.uint8,
            )
            chw = jnp.transpose(img, (2, 0, 1))
            chw = jnp.pad(chw, ((0, 0), (ypad1, ypad2), (xpad1, xpad2)))
            t = make_tiles(chw, grid)
            if pad_tiles:
                t = jnp.concatenate(
                    [t, jnp.zeros((pad_tiles,) + t.shape[1:], t.dtype)]
                )
            chunks = t.reshape((nchunk, bs) + t.shape[1:])

            def fwd(chunk):
                y, _ = self._apply(chunk)
                return y

            y = jax.lax.map(fwd, chunks)
            y = y.reshape((nchunk * bs,) + y.shape[2:])[:nt]
            if ncls > 1:
                y_class, y_seg = y[:, :ncls], y[:, ncls:]
                if augment:
                    y_class = unaugment_class_tiles(y_class, grid)
                ycf = average_tiles(y_class, grid)[
                    :, ypad1 : ypad1 + S, xpad1 : xpad1 + S
                ]
            else:
                y_seg = y
                ycf = jnp.zeros((1, S, S), jnp.float32)
            if augment:
                y_seg = unaugment_tiles(y_seg, grid)
            yf = average_tiles(y_seg, grid)[
                :, ypad1 : ypad1 + S, xpad1 : xpad1 + S
            ]
            dP = yf[:2]
            cellprob = yf[2]
            iscell = cellprob > cellprob_threshold
            return ycf, dP, iscell

        def batched(x):
            # same structure as the fused path: the natively-batched
            # integration runs once over the whole batch, outside the
            # per-tile vmap
            ycf, dP, iscell = jax.vmap(per_tile)(x)
            p = follow_flows_batched(dP, iscell, niter=niter)
            return ycf, p, iscell, dP

        return jax.jit(batched)
