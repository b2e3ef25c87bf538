"""Instance-mask recovery from predicted flow fields.

TPU-native equivalent of cellpose ``dynamics.resize_and_compute_masks``
(follow_flows → get_masks → flow-error QC → size filters) as invoked by the
reference at models.py:120-159. The per-pixel Euler integration, the
convergence histogram, seed detection, and basin clustering all run as
static-shape XLA programs; only final label renumbering and hole filling
happen on host.

Pipeline (matching cellpose semantics):
1. ``dP_scaled = dP · (cellprob > threshold) / 5``; every pixel is Euler-
   integrated ``niter`` steps along bilinearly-sampled flows, positions
   clipped to the image;
2. converged positions are rounded and histogrammed; seeds are 5×5 local
   maxima with count > 10; each seed's basin is grown over the {count > 2}
   region by 3×3 label propagation (5 rounds, cellpose's neighborhood
   extension); every foreground pixel takes the label found at its final
   position;
3. instances whose recomputed flows disagree with the predicted flows
   (MSE > flow_threshold) are removed (cellpose remove_bad_flow_masks);
4. instances larger than ``max_size_fraction``·H·W are removed; holes are
   filled and instances below ``min_size`` dropped (host, scipy), with
   sequential relabeling.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from classpose_tpu.dynamics.flows import masks_to_flows
from classpose_tpu.log import get_logger

logger = get_logger(__name__)


def _bilinear2(fields: jnp.ndarray, py: jnp.ndarray, px: jnp.ndarray):
    """Sample (2, H, W) ``fields`` at float positions with ONE gather that
    fetches the whole 2×2 bilinear footprint for both channels per index
    (slice_sizes (2, 2, 2)) — ~12% faster than four per-corner flattened
    takes on TPU, where per-index overhead dominates and the extra slice
    elements ride along for free.

    Returns two arrays shaped like ``py``; arithmetic is ordered to be
    bit-identical to the per-corner formulation."""
    C, H, W = fields.shape
    y0 = jnp.clip(jnp.floor(py), 0, H - 2).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(px), 0, W - 2).astype(jnp.int32)
    wy = (py - y0).astype(fields.dtype)
    wx = (px - x0).astype(fields.dtype)
    idx = jnp.stack([y0.ravel(), x0.ravel()], axis=1)
    g = jax.lax.gather(
        fields,
        idx,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3),
            collapsed_slice_dims=(),
            start_index_map=(1, 2),
        ),
        slice_sizes=(C, 2, 2),
        mode="clip",
    ).reshape(py.shape + (C, 2, 2))
    g = jnp.moveaxis(g, -3, 0)  # (C, ..., 2, 2)
    f00, f01 = g[..., 0, 0], g[..., 0, 1]
    f10, f11 = g[..., 1, 0], g[..., 1, 1]
    out = (
        f00 * (1 - wy) * (1 - wx)
        + f01 * (1 - wy) * wx
        + f10 * wy * (1 - wx)
        + f11 * wy * wx
    )
    return out[0], out[1]


def follow_flows(dP: jnp.ndarray, iscell: jnp.ndarray, niter: int = 200):
    """Integrate all pixels along ``dP/5`` for EXACTLY ``niter`` Euler
    steps using binary flow-map composition.

    One Euler step is the map f(x) = x + u(x) with u = dP·iscell/5
    (positions clipped to the image, as cellpose's ``steps2D_interp``
    does). Power maps f^(2^k) are built by repeated self-composition and
    the maps for the set bits of ``niter`` are composed into the result —
    popcount+log₂ resampling passes instead of ``niter`` sequential
    gathers (gathers are the expensive op on TPU; 9 passes for the default
    niter=200 = 128+64+8). Unlike round-up-to-2^k composition this honors
    the requested step count exactly (reference behavior models.py:120-159,
    niter 200 at models.py:751-752).

    Thin B=1 wrapper over :func:`follow_flows_batched` so the per-tile
    and batched paths share one implementation (and stay bit-identical —
    deliberately NOT re-jitted: wrapping in another jit would inline the
    batched program into a different outer computation and let XLA fuse
    it differently than the standalone batched call).

    Args: dP (2, H, W) predicted flows; iscell (H, W) bool. Returns final
    positions (2, H, W) float32.
    """
    return follow_flows_batched(
        jnp.asarray(dP)[None], jnp.asarray(iscell)[None], niter=niter
    )[0]


def _shift_sample2(fields: jnp.ndarray, py: jnp.ndarray, px: jnp.ndarray,
                   D: int) -> jnp.ndarray:
    """Gather-free bilinear sample of (2, H, W) ``fields`` at float
    positions whose floor offsets from each pixel's own location lie in
    [-D, D-1]: a one-hot select over the (2D)² integer offsets with rolled
    copies of the field. Bit-exact vs :func:`_bilinear2` (each output
    pixel takes exactly one selected term, same corner arithmetic) and ~3x
    faster than the XLA gather at D=3 — rolls and selects are plain
    VPU/HBM streams while 1M-index gathers serialize. Returns (2, H, W).
    """
    _, H, W = fields.shape
    giy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    gix = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    y0 = jnp.clip(jnp.floor(py), 0, H - 2).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(px), 0, W - 2).astype(jnp.int32)
    wy = (py - y0).astype(fields.dtype)
    wx = (px - x0).astype(fields.dtype)
    oy = y0 - giy
    ox = x0 - gix
    rolls: dict = {}

    def R(dy, dx):
        if (dy, dx) not in rolls:
            rolls[(dy, dx)] = jnp.roll(fields, (-dy, -dx), axis=(1, 2))
        return rolls[(dy, dx)]

    out = jnp.zeros_like(fields)
    for odY in range(-D, D):
        for odX in range(-D, D):
            sel = ((oy == odY) & (ox == odX)).astype(fields.dtype)
            f00, f01 = R(odY, odX), R(odY, odX + 1)
            f10, f11 = R(odY + 1, odX), R(odY + 1, odX + 1)
            v = (
                f00 * (1 - wy) * (1 - wx)
                + f01 * (1 - wy) * wx
                + f10 * wy * (1 - wx)
                + f11 * wy * wx
            )
            out = out + sel * v
    return out


STEP_CAP = 2.0  # max px per Euler step; see follow_flows_batched docstring

# the unrolled shift sampler ((2D)² one-hot terms) multiplies XLA's compile
# time; only production-size images amortize it (the gather it replaces is
# only expensive at ~1M pixels), so small tiles keep the compact gather
SHIFT_MIN_SIZE = 384

# The Pallas VMEM-stripe sampler (ops/sample_pallas.py) replaces the XLA
# gather on TPU at EVERY displacement bound the geometry supports: its
# halo covers the static worst case while its loops are sized by the
# measured per-stripe offset ranges, so large static bounds no longer
# cost (2D)² work (real flows displace by ≤ a cell radius).


def _pallas_sampler_mode() -> str:
    """"on" (TPU default), "off", or "interpret" (CPU-testable path),
    controlled by CLASSPOSE_PALLAS_SAMPLER."""
    import os

    ov = os.environ.get("CLASSPOSE_PALLAS_SAMPLER")
    if ov in ("0", "off"):
        return "off"
    if ov == "interpret":
        return "interpret"
    if ov in ("1", "on"):
        return "on"
    return "on" if jax.default_backend() == "tpu" else "off"


def _sample_static(u: jnp.ndarray, py: jnp.ndarray, px: jnp.ndarray,
                   bound: float, shift_min_size: int = SHIFT_MIN_SIZE):
    """Batched bilinear sample (B, 2, H, W) at (B, H, W) positions, with
    the sampler chosen STATICALLY from a trace-time displacement bound:
    the data-adaptive Pallas VMEM-stripe one-hot sampler wherever the
    geometry supports its halo (all production bounds — its loop counts
    follow the measured offsets, so even bound-144 passes stay cheap),
    the XLA shift-select for small bounds elsewhere, else the gather. A
    static choice (vs a runtime lax.cond) keeps the executed arithmetic
    identical for every batch size and content, so eval (B=1) and
    eval_batch (B=N) stay bit-identical — the runtime-cond variant broke
    that whenever mixed batches picked a different branch than a lone
    tile.

    The optimization barriers pin the pass's fusion boundary so XLA emits
    the same per-element code regardless of batch size."""
    u, py, px = jax.lax.optimization_barrier((u, py, px))
    H, W = u.shape[-2:]
    shiftable = min(H, W) >= shift_min_size
    mode = _pallas_sampler_mode()
    D = int(np.ceil(bound)) + 1
    from classpose_tpu.ops.sample_pallas import (
        sampler_supported,
        shift_sample_pallas,
    )

    pallas_ok = (
        mode != "off"
        and shiftable
        and sampler_supported(H, W, D)
    )
    if pallas_ok:
        out = shift_sample_pallas(
            u, py, px, D=D, interpret=(mode == "interpret")
        )
    elif shiftable and bound <= 2.0:
        out = jax.vmap(lambda f, a, b: _shift_sample2(f, a, b, 3))(
            u, py, px
        )
    elif shiftable and bound <= 5.0:
        out = jax.vmap(lambda f, a, b: _shift_sample2(f, a, b, 6))(
            u, py, px
        )
    else:
        out = jax.vmap(lambda f, a, b: jnp.stack(_bilinear2(f, a, b)))(
            u, py, px
        )
    return jax.lax.optimization_barrier(out)


@partial(jax.jit, static_argnames=("niter", "shift_min_size"))
def follow_flows_batched(
    dP: jnp.ndarray, iscell: jnp.ndarray, niter: int = 200,
    shift_min_size: int = SHIFT_MIN_SIZE,
) -> jnp.ndarray:
    """Batched :func:`follow_flows` — same binary flow-map composition,
    with the single-step map clamped to ±``STEP_CAP`` px per component so
    the first composition passes have a STATIC displacement bound and can
    run gather-free (:func:`_sample_static`): the two small passes cost
    ~15-30 ms/batch vs ~90 ms for an XLA gather pass at 1024²×4.

    The step clamp is the one deviation from cellpose's steps2D_interp:
    it binds only when |dP| > 5·STEP_CAP = 10, double the magnitude of
    trained cellpose flows (targets are 5·unit vectors), so real networks
    never hit it; it also guards the integration against garbage flows.
    Set CLASSPOSE_DEBUG_STEP_CAP=1 to emit a device-side diagnostic when
    the clamp actually binds (untrained/corrupted models) so divergence
    from reference outputs is visible rather than silent.

    Args: dP (B, 2, H, W); iscell (B, H, W). Returns (B, 2, H, W).
    """
    B, _, H, W = dP.shape
    u = (dP * iscell[:, None].astype(dP.dtype) / 5.0).astype(jnp.float32)
    if os.environ.get("CLASSPOSE_DEBUG_STEP_CAP") == "1":
        mx = jnp.max(jnp.abs(u))
        jax.lax.cond(
            mx > STEP_CAP,
            lambda m: jax.debug.print(
                "follow_flows: step clamp binding (max |dP|/5 = {m} px > "
                "STEP_CAP=2.0) — integration deviates from the reference "
                "Euler contract for this input", m=m,
            ),
            lambda m: None,
            mx,
        )
    u = jnp.clip(u, -STEP_CAP, STEP_CAP)
    gy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)[None]
    gx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)[None]

    def clip_disp(dy, dx):
        return jnp.stack(
            [
                jnp.clip(gy + dy, 0.0, H - 1.0) - gy,
                jnp.clip(gx + dx, 0.0, W - 1.0) - gx,
            ],
            axis=1,
        )

    u = clip_disp(u[:, 0], u[:, 1])

    niter = max(int(niter), 1)
    r = None
    bound_u = float(STEP_CAP)   # |u_k| ≤ 2^k·STEP_CAP (and ≤ image)
    bound_r = 0.0
    big = float(max(H, W))
    k_max = niter.bit_length() - 1
    for k in range(k_max + 1):
        if (niter >> k) & 1:
            if r is None:
                r = u
                bound_r = bound_u
            else:
                s = _sample_static(
                    u, gy + r[:, 0], gx + r[:, 1], bound_r, shift_min_size
                )
                r = clip_disp(r[:, 0] + s[:, 0], r[:, 1] + s[:, 1])
                bound_r = min(bound_r + bound_u, big)
        if k < k_max:
            s = _sample_static(
                u, gy + u[:, 0], gx + u[:, 1], bound_u, shift_min_size
            )
            u = clip_disp(u[:, 0] + s[:, 0], u[:, 1] + s[:, 1])
            bound_u = min(2.0 * bound_u, big)
    return jnp.stack([gy + r[:, 0], gx + r[:, 1]], axis=1)


@partial(jax.jit, static_argnames=("n_expand", "return_seeds"))
def get_masks_from_positions(
    p: jnp.ndarray,
    iscell: jnp.ndarray,
    n_expand: int = 5,
    seed_min_count: float = 10.0,
    basin_min_count: float = 2.0,
    return_seeds: bool = False,
):
    """Cluster converged positions into instance labels.

    Returns (H, W) int32 labels. Ids are DENSE seed ranks (1..n_seeds in
    raster order of the seed pixels) — instances whose basins die still
    leave gaps, so the final output is renumbered on host. The dense-rank
    assignment (a cumsum over the seed map) preserves the raster ordering
    that flat-index ids had, so the 3×3 max-id basin tie-breaking is
    bit-identical to the former flat-index labeling — and the fused QC
    can enumerate ids as 1..K with no device-side sort/top_k. With
    ``return_seeds`` also returns the (H, W) seed-id map (each instance's
    id at exactly its seed pixel, 0 elsewhere; its max is the seed
    count).
    """
    out = get_masks_from_positions_batched(
        p[None], iscell[None], n_expand=n_expand,
        seed_min_count=seed_min_count, basin_min_count=basin_min_count,
        return_seeds=return_seeds,
    )
    if return_seeds:
        return out[0][0], out[1][0]
    return out[0]


# Static displacement bound for the get_masks Pallas kernels (histogram +
# final label sample): converged positions sit within a cell radius of
# their pixel, far below 63 px for histology; tiles that beat it fall
# back to the XLA scatter/gather (bit-exact either way — all the
# arithmetic is exact small-integer f32).
GET_MASKS_PALLAS_BOUND = 64


def _cumsum_seeds(seeds: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """Inclusive prefix sum of a (B, H, W) 0/1 seed map, as int32 ranks.

    XLA lowers a length-H·W ``cumsum`` to ~log2(H·W) shifted-add passes
    over the full array (~20 passes of HBM traffic at 1024²). This is
    the same scan as a blocked two-level form whose inner scan is a
    lower-triangular matmul on the MXU: one data pass + a tiny
    block-offset scan. Exact: per-block counts ≤ 512 and totals ≤ H·W
    < 2^24 stay integral in f32. Falls back to ``jnp.cumsum`` when the
    pixel count doesn't split into 512-wide blocks (non-production
    geometries) or when CLASSPOSE_MXU_CUMSUM=0."""
    B = seeds.shape[0]
    HW = H * W
    blk = 512
    if HW % blk != 0 or HW < 4 * blk or os.environ.get(
        "CLASSPOSE_MXU_CUMSUM"
    ) == "0":
        return jnp.cumsum(
            seeds.reshape(B, HW).astype(jnp.int32), axis=1
        ).reshape(B, H, W)
    nblk = HW // blk
    s = seeds.reshape(B, nblk, blk).astype(jnp.float32)
    tri = jnp.tril(jnp.ones((blk, blk), jnp.float32))
    inner = jax.lax.dot_general(
        s, tri,
        (((2,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, nblk, blk) inclusive within-block scan
    offs = jnp.cumsum(inner[:, :, -1], axis=1) - inner[:, :, -1]
    return (inner + offs[:, :, None]).astype(jnp.int32).reshape(B, H, W)


@partial(jax.jit, static_argnames=("n_expand", "return_seeds"))
def get_masks_from_positions_batched(
    p: jnp.ndarray,
    iscell: jnp.ndarray,
    n_expand: int = 5,
    seed_min_count: float = 10.0,
    basin_min_count: float = 2.0,
    return_seeds: bool = False,
):
    """Natively batched :func:`get_masks_from_positions` ((B, 2, H, W)
    positions, (B, H, W) foreground). On TPU the two ~1M-dynamic-index
    ops — the landing-position histogram (scatter-add) and the final
    label lookup (gather) — run as bounded-displacement Pallas stripe
    kernels (ops/sample_pallas.py) when every tile's displacement fits
    ``GET_MASKS_PALLAS_BOUND``; a runtime guard falls back to the XLA
    scatter/gather otherwise. Both paths are bit-exact (integer counts,
    0/1 bilinear weights at integer positions), so the guard cannot
    change results."""
    B, _, H, W = p.shape
    fy = jnp.clip(jnp.round(p[:, 0]), 0, H - 1).astype(jnp.int32)
    fx = jnp.clip(jnp.round(p[:, 1]), 0, W - 1).astype(jnp.int32)
    cellf = iscell.astype(jnp.float32)

    from classpose_tpu.ops.sample_pallas import (
        _pick_row_block,
        _stripe_bounds_int,
        sampler_supported,
        scatter_count_pallas,
        shift_sample_pallas,
    )

    import os as _os

    mode = _pallas_sampler_mode()
    D = GET_MASKS_PALLAS_BOUND
    # CLASSPOSE_GM_PALLAS=0 opts OUT of the Pallas histogram/label-sample
    # kernels. Default ON (r5): at the production cell density the
    # stripe kernels beat the XLA scatter/gather by 28% (130.9 vs
    # 181.9 ms per 8x1024² batch at 1024 inst/tile,
    # tools/bench_ff_gm.py) — the r3 default-OFF call was measured at
    # 441 inst/tile (113.5 vs 126.1 ms), where the landing-position
    # histogram is sparser and XLA's scatter serializes less; cost is
    # density-dependent and production tiles sit at the dense end. Both
    # paths are bit-exact and runtime-guarded (displacement past
    # GET_MASKS_PALLAS_BOUND falls back to the scatter), so the flip
    # cannot change results.
    gm_env = _os.environ.get("CLASSPOSE_GM_PALLAS")
    pallas_ok = (
        mode != "off"
        and gm_env != "0"
        and sampler_supported(H, W, D, 3)
        and sampler_supported(H, W, D, 1)
    )
    interpret = mode == "interpret"

    def h_xla(fy, fx, cellf):
        flat = (fy * W + fx).reshape(B, H * W)
        return jax.vmap(
            lambda f, c: jnp.zeros(H * W, jnp.float32).at[f].add(c)
        )(flat, cellf.reshape(B, H * W)).reshape(B, H, W)

    if pallas_ok:
        R = _pick_row_block(H, W, -(-D // 8) * 8, 3)
        _, ok_tiles = _stripe_bounds_int(fy, fx, H, W, R, D)
        ok = jnp.all(ok_tiles)
        h = jax.lax.cond(
            ok,
            lambda a, b, c: scatter_count_pallas(
                a, b, c, D, interpret=interpret),
            h_xla,
            fy, fx, cellf,
        )
    else:
        h = h_xla(fy, fx, cellf)

    hmax = jax.lax.reduce_window(
        h, -jnp.inf, jax.lax.max, (1, 5, 5), (1, 1, 1), "SAME"
    )
    seeds = (h >= hmax) & (h > seed_min_count)

    rank = _cumsum_seeds(seeds, H, W)
    seed_lab = jnp.where(seeds, rank, 0)
    grow = h > basin_min_count

    def body(_, lab):
        lab_max = jax.lax.reduce_window(
            lab, 0, jax.lax.max, (1, 3, 3), (1, 1, 1), "SAME"
        )
        lab = jnp.where(grow & (lab == 0), lab_max, lab)
        # seeds always keep their own id
        return jnp.where(seeds, seed_lab, lab)

    lab = jax.lax.fori_loop(0, n_expand, body, seed_lab)

    def m_xla(lab, fy, fx):
        flat = (fy * W + fx).reshape(B, H * W)
        return jax.vmap(lambda l, f: l.ravel()[f])(lab, flat).reshape(
            B, H, W
        )

    if pallas_ok:
        masks = jax.lax.cond(
            ok,
            lambda l, a, b: shift_sample_pallas(
                l.astype(jnp.float32)[:, None], a.astype(jnp.float32),
                b.astype(jnp.float32), D, interpret=interpret,
            )[:, 0].astype(jnp.int32),
            m_xla,
            lab, fy, fx,
        )
    else:
        masks = m_xla(lab, fy, fx)
    masks = jnp.where(iscell, masks, 0)
    if return_seeds:
        return masks, seed_lab
    return masks


def qc_filter_masks(
    raw: jnp.ndarray,
    dP: jnp.ndarray,
    flow_threshold: float = 0.4,
    max_size_fraction: float = 0.4,
) -> jnp.ndarray:
    """Device-side max-size filter + flow-error QC on RAW (non-dense)
    instance labels — the fully-fused form of the host path in
    :func:`compute_masks` (cellpose ``remove_bad_flow_masks`` semantics).

    Per-instance statistics are scatter reductions over the flat label
    array (labels are flattened seed indices, so bins span H·W+2), which
    keeps every shape static regardless of the instance count:

    1. instances covering more than ``max_size_fraction``·H·W pixels are
       removed;
    2. the diffusion horizon is derived from the largest surviving
       instance's bbox extent with the same bucketing as the host path
       (``bucket(min(max(2·ext, 40), 400), 40)``) as a traced scalar — the
       loop lowers to a while, so no recompiles;
    3. each instance's center is its in-mask pixel nearest the centroid
       (ties broken by lowest flat index, matching
       ``instance_center_map``);
    4. flows recomputed by masked heat diffusion; instances whose mean
       squared error vs ``dP/5`` exceeds ``flow_threshold`` are removed.

    Returns (H, W) int32 raw labels with failing instances zeroed —
    densify on host. Designed to run inside the batched-eval program so
    only small int outputs cross the (slow) host↔device link.

    Internally staged as prepare → diffuse → finish so the batched caller
    can swap the diffusion for the Pallas halo-blocked kernel
    (:mod:`classpose_tpu.ops.diffusion_pallas`) on TPU.
    """
    from classpose_tpu.dynamics.flows import _diffuse_dyn, grad_from_T

    ids2d, center_map, niter_qc = qc_prepare(raw, max_size_fraction)
    if flow_threshold is None or flow_threshold <= 0:
        return ids2d
    T = _diffuse_dyn(ids2d, center_map, niter_qc)
    mu = grad_from_T(ids2d, T)
    return qc_finish(ids2d, mu, dP, flow_threshold)


def qc_filter_masks_fused(
    raw: jnp.ndarray,
    dP: jnp.ndarray,
    flow_threshold: float = 0.4,
    max_size_fraction: float = 0.4,
    max_instances: int = 4096,
    chunk: int | None = None,
    dense_output: bool = False,
    window: int | None = None,
    return_window_ok: bool = False,
) -> jnp.ndarray:
    """Device QC with one-hot segment reductions instead of scatters.

    Same semantics as :func:`qc_filter_masks` (max-size filter →
    extent-derived diffusion horizon → nearest-to-centroid centers →
    flow-error removal) for tiles with ≤ ``max_instances`` instances, but
    ~10x faster on TPU: every per-instance statistic is a chunked masked
    reduction over a pixels×K match matrix (K = ``max_instances``), which
    XLA fuses into compare→select→reduce loops with no HBM scatter/gather.
    Ids must be DENSE ranks as produced by
    :func:`get_masks_from_positions` — column k of the match matrix is
    simply id k+1, with no device-side unique/top_k.

    Ids beyond ``max_instances`` (pathological for 1024² histology tiles)
    are DROPPED in every output path — callers detect the condition from
    the seed count (``seed_lab.max()``) and should fall back to the
    scatter QC for such tiles (see ``ClassposeModel._eval_batch_fused``).

    Returns (H, W) int32 raw labels with failing instances zeroed; with
    ``dense_output`` the surviving instances are instead relabeled on
    device to ascending-by-id values in [1, K] and returned as int16 —
    half the device→host bytes, and the host skips its densify pass (the
    ascending order keeps the final sequential relabeling identical to
    the raw-id path).

    Non-divisible geometries (H·W % chunk ≠ 0) are zero-padded up to the
    next chunk multiple; pad pixels carry id 0, match no column, and
    cannot become centers, so every sweep is unaffected.

    ``window`` < K exploits the raster ordering of the dense ranks: the
    ids present in one chunk span a narrow rank window, so each sweep
    matches only ``window`` sliding columns (4x less work at the
    defaults). ``return_window_ok`` additionally returns a bool that is
    False when any chunk's id spread exceeded the window (pathological
    densities) — the result is then unusable and the caller must fall
    back to the scatter QC, exactly like the > ``max_instances``
    overflow case.
    """
    from classpose_tpu.dynamics.flows import _diffuse_dyn, grad_from_T

    if chunk is None:
        # The sweeps' cost has two parts: per-pixel one-hot work
        # ∝ HW·window, and per-chunk-iteration FIXED cost (six fori
        # loops of HW/chunk iterations each — loop bookkeeping, dynamic
        # slices, K-table read-modify-writes). The r5 solo breakdown
        # put the window-INDEPENDENT intercept at ~98 ms per 8×1024²
        # batch with the original 8192-px (8-row) chunks — i.e. the
        # iteration count, not the arithmetic, dominated. 32768-px
        # (32-row) chunks quarter it; the id spread a window must cover
        # grows with chunk rows (see window default below).
        # CLASSPOSE_QC_CHUNK overrides.
        chunk = int(os.environ.get("CLASSPOSE_QC_CHUNK", "32768"))
    if window is None:
        # per-pixel sweep work is linear in the window width. Dense
        # ranks are raster-ordered, so the ids present in one chunk ≈
        # cells whose seed lies within ±cell-height of its rows: at the
        # densest real histology basis (4000 nuclei/Mpx, ~12-16 px
        # cells) a 32-row chunk spans ~(32+16)·3.9 ≈ 187 ids — window
        # 256 covers it with ~37% margin. The window_ok guard is PER
        # TILE: a pathological tile costs one scatter-QC redo of
        # itself, not the batch. Measured (tools/bench_gm_breakdown.py,
        # 8×1024² design-field load): chunk-8192 512/256/128 =
        # 172.6/132.6/116.8 ms; chunk-32768 = 128.9/104.9/99.2 — the
        # (32768, 256) default is 28 ms faster than the old
        # (8192, 256) at equal density margins.
        # CLASSPOSE_QC_WINDOW overrides.
        window = int(os.environ.get("CLASSPOSE_QC_WINDOW", "256"))

    H, W = raw.shape
    HW = H * W
    K = int(max_instances)
    C = int(min(chunk, HW))
    HWp = -(-HW // C) * C  # padded length: next multiple of the chunk
    npad = HWp - HW
    nchunk = HWp // C
    big = jnp.float32(1e9)

    def padded(a, value=0):
        return jnp.pad(a, (0, npad), constant_values=value) if npad else a

    ids = padded(raw.ravel().astype(jnp.int32))

    idxf = jnp.arange(HW, dtype=jnp.int32)
    yy = padded((idxf // W).astype(jnp.float32))
    xx = padded((idxf % W).astype(jnp.float32))
    xf = padded(idxf.astype(jnp.float32), value=HW)

    # ---- sliding id windows (the dense-rank locality optimization) ----
    # ids are dense seed ranks in raster order, so the ids present in one
    # C-pixel chunk (8 image rows at 1024²) span a narrow rank window —
    # each sweep only needs KW columns per chunk instead of all K (4x
    # less work at KW=1024). Chunks are guarded: if any chunk's id spread
    # exceeds KW (pathological density), ``window_ok`` comes back False
    # and the caller must fall back to the scatter QC.
    KW = int(min(window, K))
    ids_c = ids.reshape(nchunk, C)
    ids_v = jnp.where(ids_c > K, 0, ids_c)  # overflow ids match nothing
    posmin = jnp.where(ids_v > 0, ids_v, K + 1).min(axis=1)  # (nchunk,)
    posmax = ids_v.max(axis=1)
    wstart = jnp.clip(posmin - 1, 0, max(K - KW, 0))  # 0-based col offset
    window_ok = jnp.all(
        (posmax == 0) | (posmax - 1 - wstart < KW)
    )
    wcols = jnp.arange(KW, dtype=jnp.int32)

    def slc(a, c):
        return jax.lax.dynamic_slice_in_dim(a, c * C, C)

    def match(sl, w):
        # window column j ↔ id w + 1 + j; id 0 and out-of-window ids
        # match no column by construction
        return sl[:, None] == (w + 1 + wcols)[None, :]

    def wslice(table, w):
        """KW-slice of a K-sized per-instance table at the window."""
        return jax.lax.dynamic_slice_in_dim(table, w, KW)

    def wadd(table, w, vals):
        return table.at[w + wcols].add(vals)

    # sweep 1: pixel counts, centroid sums, bboxes
    def s1(c, acc):
        n, sy, sx, ymin, ymax, xmin, xmax = acc
        w = wstart[c]
        sl, yc, xc = slc(ids, c), slc(yy, c), slc(xx, c)
        M = match(sl, w)
        Mf = M.astype(jnp.float32)
        n = wadd(n, w, Mf.sum(0))
        sy = wadd(sy, w, (Mf * yc[:, None]).sum(0))
        sx = wadd(sx, w, (Mf * xc[:, None]).sum(0))
        ymin = ymin.at[w + wcols].min(
            jnp.min(jnp.where(M, yc[:, None], big), 0)
        )
        ymax = ymax.at[w + wcols].max(
            jnp.max(jnp.where(M, yc[:, None], -big), 0)
        )
        xmin = xmin.at[w + wcols].min(
            jnp.min(jnp.where(M, xc[:, None], big), 0)
        )
        xmax = xmax.at[w + wcols].max(
            jnp.max(jnp.where(M, xc[:, None], -big), 0)
        )
        return n, sy, sx, ymin, ymax, xmin, xmax

    z = jnp.zeros(K, jnp.float32)
    n, sy, sx, ymin, ymax, xmin, xmax = jax.lax.fori_loop(
        0, nchunk, s1,
        (z, z, z, jnp.full(K, big), jnp.full(K, -big), jnp.full(K, big),
         jnp.full(K, -big)),
    )

    if max_size_fraction is not None and max_size_fraction > 0:
        too_big = n > max_size_fraction * HW
    else:
        too_big = jnp.zeros(K, bool)
    tb_f = too_big.astype(jnp.float32)
    n2 = jnp.where(too_big, 0.0, n)
    present = n2 > 0
    ext = jnp.where(
        present, jnp.maximum(ymax - ymin, xmax - xmin) + 1.0, 0.0
    )
    niter_qc = jnp.clip(2.0 * jnp.maximum(jnp.max(ext), 1.0), 40.0, 400.0)
    niter_qc = (40.0 * jnp.ceil(niter_qc / 40.0)).astype(jnp.int32)

    cy = sy / jnp.maximum(n, 1.0)
    cx = sx / jnp.maximum(n, 1.0)

    # sweep 2: size/overflow filter + per-pixel centroid distance +
    # per-instance dmin. Overflow ids (> K) are zeroed here so every
    # later sweep (and both output paths) sees a consistent label set.
    def s2(c, acc):
        ids_f, d_all, dmin = acc
        w = wstart[c]
        sl, yc, xc = slc(ids, c), slc(yy, c), slc(xx, c)
        M = match(sl, w)
        Mf = M.astype(jnp.float32)
        tb_w = wslice(tb_f, w)
        nb_w = wslice((~too_big).astype(jnp.float32), w)
        tbp = (Mf * tb_w[None, :]).sum(1) > 0
        sl_f = jnp.where(tbp | (sl > K), 0, sl)
        fg2 = sl_f > 0
        M2f = Mf * nb_w[None, :]
        M2 = M2f > 0
        cyp = (M2f * wslice(cy, w)[None, :]).sum(1)
        cxp = (M2f * wslice(cx, w)[None, :]).sum(1)
        dch = jnp.where(fg2, (yc - cyp) ** 2 + (xc - cxp) ** 2, big)
        dmin = dmin.at[w + wcols].min(
            jnp.min(jnp.where(M2, dch[:, None], big), 0)
        )
        ids_f = jax.lax.dynamic_update_slice_in_dim(ids_f, sl_f, c * C, 0)
        d_all = jax.lax.dynamic_update_slice_in_dim(d_all, dch, c * C, 0)
        return ids_f, d_all, dmin

    ids_f, d_all, dmin = jax.lax.fori_loop(
        0, nchunk, s2,
        (jnp.zeros(HWp, jnp.int32), jnp.full(HWp, big), jnp.full(K, big)),
    )
    ids2d = ids_f[:HW].reshape(H, W)

    # column j of window w holds id w+j+1 (ascending), so the
    # ascending-by-id dense relabel value is simply the id itself
    dense_val = jnp.arange(1, K + 1, dtype=jnp.float32)

    def densify_sweep(sl_f, good_f, w):
        Mf = match(sl_f, w).astype(jnp.float32)
        vals = wslice(good_f * dense_val, w)
        return (Mf * vals[None, :]).sum(1).astype(jnp.int16)

    if flow_threshold is None or flow_threshold <= 0:
        if not dense_output:
            return (ids2d, window_ok) if return_window_ok else ids2d
        ok_f = present.astype(jnp.float32)

        def s6a(c, out):
            sl_f = slc(ids_f, c)
            return jax.lax.dynamic_update_slice_in_dim(
                out, densify_sweep(sl_f, ok_f, wstart[c]), c * C, 0
            )

        out = jax.lax.fori_loop(
            0, nchunk, s6a, jnp.zeros(HWp, jnp.int16)
        )[:HW].reshape(H, W)
        return (out, window_ok) if return_window_ok else out

    # sweep 3: per-instance lowest flat index among nearest-to-centroid
    def s3(c, idxmin):
        w = wstart[c]
        sl_f, dch, ic = slc(ids_f, c), slc(d_all, c), slc(xf, c)
        M2 = match(sl_f, w)
        M2f = M2.astype(jnp.float32)
        dminp = (M2f * wslice(dmin, w)[None, :]).sum(1)
        cand = (sl_f > 0) & (dch <= dminp)
        idxmin = idxmin.at[w + wcols].min(
            jnp.min(jnp.where(M2 & cand[:, None], ic[:, None], big), 0)
        )
        return idxmin

    idxmin = jax.lax.fori_loop(0, nchunk, s3, jnp.full(K, big))

    # center map: each instance's center is EXACTLY the pixel at flat
    # index idxmin[k], so a K-sized scatter places them — no fourth
    # pixels×K sweep needed (scatters are only expensive at ~1M indices;
    # K=4096 is free). Invalid columns carry the `big` sentinel and are
    # dropped by the out-of-range scatter mode.
    center_idx = jnp.where(
        idxmin < big, idxmin, jnp.float32(HW)
    ).astype(jnp.int32)
    center_map = (
        jnp.zeros(HW + 1, jnp.float32)
        .at[center_idx]
        .set(1.0, mode="drop")[:HW]
        .reshape(H, W)
    )

    T = _diffuse_dyn(ids2d, center_map, niter_qc)
    mu = grad_from_T(ids2d, T)

    # sweep 5: per-instance flow-error sums
    err_map = padded(
        ((mu - dP.astype(jnp.float32) / 5.0) ** 2).sum(axis=0).ravel()
    )

    def s5(c, s_e):
        w = wstart[c]
        sl_f, ec = slc(ids_f, c), slc(err_map, c)
        Mf = match(sl_f, w).astype(jnp.float32)
        return wadd(s_e, w, (Mf * ec[:, None]).sum(0))

    s_e = jax.lax.fori_loop(0, nchunk, s5, jnp.zeros(K, jnp.float32))
    bad = s_e / jnp.maximum(n2, 1.0) > flow_threshold
    good_f = (present & ~bad).astype(jnp.float32)

    # sweep 6: keep only pixels of passing instances
    if dense_output:
        def s6(c, out):
            sl_f = slc(ids_f, c)
            return jax.lax.dynamic_update_slice_in_dim(
                out, densify_sweep(sl_f, good_f, wstart[c]), c * C, 0
            )

        out = jax.lax.fori_loop(
            0, nchunk, s6, jnp.zeros(HWp, jnp.int16)
        )[:HW].reshape(H, W)
        return (out, window_ok) if return_window_ok else out

    def s6(c, out):
        w = wstart[c]
        sl_f = slc(ids_f, c)
        Mf = match(sl_f, w).astype(jnp.float32)
        keep = (Mf * wslice(good_f, w)[None, :]).sum(1) > 0
        return jax.lax.dynamic_update_slice_in_dim(
            out, jnp.where(keep, sl_f, 0), c * C, 0
        )

    out = jax.lax.fori_loop(
        0, nchunk, s6, jnp.zeros(HWp, jnp.int32)
    )[:HW].reshape(H, W)
    return (out, window_ok) if return_window_ok else out


def qc_prepare(raw: jnp.ndarray, max_size_fraction: float = 0.4):
    """Stage 1 of the device QC: max-size filter, extent-derived diffusion
    horizon, exact nearest-to-centroid center map. Returns
    (filtered ids (H, W) int32, center map (H, W) f32, niter_qc scalar)."""
    H, W = raw.shape
    HW = H * W
    nb = HW + 2  # raw ids are flattened seed indices + 1
    big = jnp.float32(1e9)
    ids = raw.ravel().astype(jnp.int32)
    fg = ids > 0
    fgf = fg.astype(jnp.float32)
    n = jnp.zeros(nb, jnp.float32).at[ids].add(fgf)

    if max_size_fraction is not None and max_size_fraction > 0:
        too_big = n > max_size_fraction * HW
        ids = jnp.where(fg & ~too_big[ids], ids, 0)
        fg = ids > 0
        fgf = fg.astype(jnp.float32)
        n = jnp.zeros(nb, jnp.float32).at[ids].add(fgf)

    idx = jnp.arange(HW, dtype=jnp.int32)
    yy = (idx // W).astype(jnp.float32)
    xx = (idx % W).astype(jnp.float32)

    # bbox extents → diffusion horizon (host formula, traced)
    ymin = jnp.full(nb, big).at[ids].min(jnp.where(fg, yy, big))
    ymax = jnp.full(nb, -big).at[ids].max(jnp.where(fg, yy, -big))
    xmin = jnp.full(nb, big).at[ids].min(jnp.where(fg, xx, big))
    xmax = jnp.full(nb, -big).at[ids].max(jnp.where(fg, xx, -big))
    present = (n > 0).at[0].set(False)
    ext = jnp.where(
        present, jnp.maximum(ymax - ymin, xmax - xmin) + 1.0, 0.0
    )
    niter_qc = jnp.clip(2.0 * jnp.maximum(jnp.max(ext), 1.0), 40.0, 400.0)
    niter_qc = (40.0 * jnp.ceil(niter_qc / 40.0)).astype(jnp.int32)

    # centers: nearest in-mask pixel to the centroid, lowest index on ties
    sy = jnp.zeros(nb, jnp.float32).at[ids].add(yy * fgf)
    sx = jnp.zeros(nb, jnp.float32).at[ids].add(xx * fgf)
    cy = sy / jnp.maximum(n, 1.0)
    cx = sx / jnp.maximum(n, 1.0)
    d = jnp.where(fg, (yy - cy[ids]) ** 2 + (xx - cx[ids]) ** 2, big)
    dmin = jnp.full(nb, big).at[ids].min(d)
    cand = fg & (d <= dmin[ids])
    idxmin = (
        jnp.full(nb, HW + 1, jnp.int32)
        .at[jnp.where(cand, ids, 0)]
        .min(jnp.where(cand, idx, HW + 1))
    )
    center_map = (cand & (idx == idxmin[ids])).astype(jnp.float32)
    return (
        ids.reshape(H, W),
        center_map.reshape(H, W),
        niter_qc,
    )


def qc_finish(ids2d: jnp.ndarray, mu: jnp.ndarray, dP: jnp.ndarray,
              flow_threshold: float) -> jnp.ndarray:
    """Stage 3: per-instance mean squared error vs ``dP/5``; failing
    instances zeroed."""
    H, W = ids2d.shape
    nb = H * W + 2
    ids = ids2d.ravel()
    fg = ids > 0
    fgf = fg.astype(jnp.float32)
    n = jnp.zeros(nb, jnp.float32).at[ids].add(fgf)
    err_map = ((mu - dP.astype(jnp.float32) / 5.0) ** 2).sum(axis=0).ravel()
    s = jnp.zeros(nb, jnp.float32).at[ids].add(err_map * fgf)
    bad = (s / jnp.maximum(n, 1.0) > flow_threshold).at[0].set(False)
    return jnp.where(fg & ~bad[ids], ids, 0).reshape(H, W)


def flow_errors(masks, dP, max_id: int | None = None,
                niter: int | None = None, device=None):
    """Per-instance mean squared error between flows recomputed from the
    candidate masks and the predicted flows (cellpose flow QC,
    ``remove_bad_flow_masks``). Returns (nmax+1,) float32.

    The flow recomputation runs on device (shape-stable); the per-instance
    aggregation is a host bincount, so nothing recompiles when the
    instance count changes tile to tile. ``niter=None`` derives the
    diffusion horizon from the largest instance extent (what cellpose's
    GPU path does), bucketed to bound recompiles."""
    from classpose_tpu.dynamics.flows import _bucket, _max_instance_extent

    masks_np = np.asarray(masks)
    if niter is None:
        niter = _bucket(
            min(max(2 * _max_instance_extent(masks_np), 40), 400), 40
        )
    mu = np.asarray(masks_to_flows(masks_np, niter=niter, device=device))
    dP_np = np.asarray(dP)
    err_map = ((mu - dP_np / 5.0) ** 2).sum(axis=0)
    ids = masks_np.ravel().astype(np.int64)
    fg = ids > 0
    nmax = int(masks_np.max()) if max_id is None else max_id
    n = np.bincount(ids[fg], minlength=nmax + 1)
    s = np.bincount(ids[fg], weights=err_map.ravel()[fg],
                    minlength=nmax + 1)
    return (s / np.maximum(n, 1)).astype(np.float32)


try:  # cv2 floodFill is ~2.6x faster than scipy's iterative dilation here
    import cv2 as _cv2
except ImportError:  # pragma: no cover - cv2 is in the supported image
    _cv2 = None


def _binary_fill_holes(crop: np.ndarray) -> np.ndarray:
    """binary_fill_holes for a 2D bool crop: flood the background from the
    border; anything unreached is a hole. cv2.floodFill when available
    (identical output to scipy.ndimage.binary_fill_holes, measured 2.6x
    faster over a realistic 1500-instance tile), scipy fallback."""
    if _cv2 is None:
        from scipy import ndimage

        return ndimage.binary_fill_holes(crop)
    h, w = crop.shape
    m = np.zeros((h + 2, w + 2), np.uint8)
    m[1:-1, 1:-1] = crop
    ff = m.copy()
    scratch = np.zeros((h + 4, w + 4), np.uint8)
    _cv2.floodFill(ff, scratch, (0, 0), 1)
    return (m | (1 - ff))[1:-1, 1:-1].astype(bool)


def fill_holes_and_remove_small_masks(
    masks: np.ndarray, min_size: int = 15
) -> np.ndarray:
    """Fill holes per instance and drop instances below ``min_size`` pixels,
    relabeling sequentially (cellpose utils.fill_holes_and_remove_small_masks
    as used at reference models.py:171-174).

    Takes the native C++ core when available (one flood fill per
    instance is pure loop work — ~25x faster than the per-crop
    numpy/cv2 path at 1k instances/tile, which sits on the pipeline's
    critical host path); the numpy fallback below has identical
    semantics and pins the native one in tests."""
    from classpose_tpu.native import load_geomfast

    masks = np.asarray(masks)
    lib = load_geomfast()
    if lib is not None and masks.ndim == 2:
        import ctypes

        m = np.ascontiguousarray(masks, np.int32)
        out = np.zeros_like(m)
        lib.fill_holes_relabel(
            m.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            m.shape[0], m.shape[1], int(min_size),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return out

    from scipy import ndimage

    out = np.zeros_like(masks, dtype=np.int32)
    slices = ndimage.find_objects(masks)
    new_id = 1
    for i, sl in enumerate(slices, start=1):
        if sl is None:
            continue
        crop = masks[sl] == i
        if np.count_nonzero(crop) < max(min_size, 1):
            continue
        filled = _binary_fill_holes(crop)
        out_crop = out[sl]
        out_crop[filled] = new_id
        new_id += 1
    return out


def densify_labels(raw: np.ndarray) -> np.ndarray:
    """Remap sparse non-negative labels to dense 0..n (0 stays background).

    Same mapping as ``np.unique(..., return_inverse=True)`` (ascending ids →
    sequential) but via bincount + cumsum — ~4x faster at 1024² since it
    avoids the 1M-element sort."""
    raw = np.asarray(raw)
    counts = np.bincount(raw.ravel(), minlength=int(raw.max()) + 1)
    newid = np.cumsum(counts > 0, dtype=np.int32)
    if counts[0] > 0:
        newid -= 1
    newid[0] = 0
    return newid[raw]


def compute_masks(
    dP: np.ndarray,
    cellprob: np.ndarray,
    niter: int = 200,
    cellprob_threshold: float = 0.0,
    flow_threshold: float = 0.4,
    min_size: int = 15,
    max_size_fraction: float = 0.4,
    qc_niter: int | None = None,
    qc_downsample: int = 1,
    device=None,
) -> np.ndarray:
    """Full mask recovery for one (2, H, W) flow field + (H, W) cellprob.

    Device portion (Euler + clustering + flow QC) is jitted; host portion
    does sequential relabeling and hole filling. Returns (H, W) int32.
    """
    # diagnosability of the STEP_CAP deviation (cellpose steps2D_interp has
    # no clamp): flag inputs where the per-step clamp would actually bind —
    # |dP| > 5·STEP_CAP only happens for untrained/corrupted flows
    if logger.isEnabledFor(10):  # DEBUG: host-side max|dP| readback
        peak = float(np.abs(np.asarray(dP)).max())
        if peak > 5.0 * STEP_CAP:
            logger.debug(
                "flow magnitude %.1f exceeds 5*STEP_CAP=%.1f: Euler steps "
                "are clamped and integration deviates from cellpose",
                peak, 5.0 * STEP_CAP,
            )
    if device is not None:
        dP = jax.device_put(np.asarray(dP, np.float32), device)
        cellprob = jax.device_put(np.asarray(cellprob, np.float32), device)
    else:
        dP = jnp.asarray(dP, jnp.float32)
        cellprob = jnp.asarray(cellprob, jnp.float32)
    iscell = cellprob > cellprob_threshold

    if not bool(jnp.any(iscell)):
        return np.zeros(cellprob.shape, np.int32)

    p = follow_flows(dP, iscell, niter=niter)
    raw = np.asarray(get_masks_from_positions(p, iscell))

    # densify ids on host
    masks = densify_labels(raw)
    nmax = int(masks.max())
    if nmax == 0:
        return masks

    # max-size filter (cellpose get_masks tail)
    counts = np.bincount(masks.ravel(), minlength=nmax + 1)
    H, W = masks.shape
    too_big = counts > max_size_fraction * H * W
    too_big[0] = False
    if too_big.any():
        masks[too_big[masks]] = 0
        masks = densify_labels(masks)
        nmax = int(masks.max())
        if nmax == 0:
            return masks

    # flow-error QC; qc_downsample=2 runs the recomputation at half
    # resolution (4x less traffic). APPROXIMATION: thin instances that
    # vanish under striding skip QC and small cells' errors shift — use
    # only when throughput matters more than exact reference parity
    if flow_threshold is not None and flow_threshold > 0:
        d = max(1, int(qc_downsample))
        errs = flow_errors(
            masks[::d, ::d], np.asarray(dP)[:, ::d, ::d],
            max_id=nmax, niter=qc_niter, device=device,
        )
        bad = errs > flow_threshold
        bad[0] = False
        if bad.any():
            masks[bad[masks]] = 0

    return fill_holes_and_remove_small_masks(masks, min_size=min_size)
