"""3D segmentation support: orthogonal-plane flow aggregation and
IoU-based plane stitching.

Parity targets:
- ``run_3D`` (reference core.py:234-312): run the 2D net over YX, ZY, ZX
  plane stacks and sum the flow components into a 3D field [dZ, dY, dX,
  cellprob] (class channels aggregated the same way);
- ``stitch3D`` (cellpose utils, used at reference models.py:171-174):
  greedily link 2D masks across consecutive planes when IoU >
  ``stitch_threshold``;
- 3D mask recovery: the 2D dynamics generalize — trilinear flow-map
  composition squaring + 3D convergence histogram + 3×3×3 label
  propagation (classpose_tpu.dynamics semantics lifted one dimension).
"""

from __future__ import annotations

import numpy as np

from classpose_tpu.log import get_logger
from classpose_tpu.metrics.utils import pairwise_iou_matrix

logger = get_logger(__name__)


def run_3D(
    apply_fn,
    imgs: np.ndarray,
    n_cell_classes: int = 1,
    batch_size: int = 8,
    augment: bool = False,
    tile_overlap: float = 0.1,
    bsize: int = 256,
):
    """Run the network on a (Lz, Ly, Lx, nchan) stack over three orthogonal
    plane orders and sum flow components (reference core.py:270-312).

    Returns (yf (Lz, Ly, Lx, 4) [dY?, ...] following the reference's
    component layout: yf[..., :3] are the summed flow components
    [dZ? — see axes maps], yf[..., -1] the summed cellprob; y_classf
    (Lz, Ly, Lx, ncls) or None; styles).
    """
    from classpose_tpu.runner.core import run_net

    sstr = ["YX", "ZY", "ZX"]
    pm = [(0, 1, 2, 3), (1, 0, 2, 3), (2, 0, 1, 3)]
    ipm = [(0, 1, 2), (1, 0, 2), (1, 2, 0)]
    cp = [(1, 2), (0, 2), (0, 1)]
    cpy = [(0, 1), (0, 1), (0, 1)]
    shape = imgs.shape[:-1]
    yf = np.zeros((*shape, 4), np.float32)
    y_classf = (
        np.zeros((*shape, n_cell_classes), np.float32)
        if n_cell_classes > 1
        else None
    )
    styles = None
    for p in range(3):
        xsl = imgs.transpose(pm[p])
        logger.info(
            "running %s: %d planes of size (%d, %d)",
            sstr[p], shape[pm[p][0]], shape[pm[p][1]], shape[pm[p][2]],
        )
        y, y_class, styles = run_net(
            apply_fn,
            xsl,
            n_cell_classes=n_cell_classes,
            batch_size=batch_size,
            augment=augment,
            bsize=bsize,
            tile_overlap=tile_overlap,
        )
        yf[..., -1] += y[..., -1].transpose(ipm[p])
        for j in range(2):
            yf[..., cp[p][j]] += y[..., cpy[p][j]].transpose(ipm[p])
        if y_classf is not None:
            for c in range(n_cell_classes):
                y_classf[..., c] += y_class[..., c].transpose(ipm[p])
    return yf, y_classf, styles


def stitch3D(masks: np.ndarray, stitch_threshold: float = 0.25) -> np.ndarray:
    """Stitch per-plane 2D instance masks into 3D instances by IoU linking
    (cellpose utils.stitch3D semantics)."""
    masks = np.asarray(masks).copy()
    mmax = int(masks[0].max())
    for i in range(len(masks) - 1):
        iou = pairwise_iou_matrix(masks[i], masks[i + 1])
        if iou.size == 0:
            # one of the planes has no instances: give the next plane
            # fresh global ids (no stitching possible)
            nxt = masks[i + 1]
            ids_next = np.unique(nxt)
            ids_next = ids_next[ids_next > 0]
            lookup = np.zeros(int(nxt.max()) + 1, masks.dtype)
            for gid in ids_next:
                mmax += 1
                lookup[gid] = mmax
            masks[i + 1] = lookup[nxt]
            continue
        # for each next-plane instance, its best current-plane match
        iou = np.where(iou >= stitch_threshold, iou, 0.0)
        best = iou.argmax(axis=0)  # (n_next,)
        best_val = iou.max(axis=0)
        istitch = best + 1
        ino = np.nonzero(best_val == 0.0)[0]
        # unmatched next-plane instances get fresh ids
        istitch = np.where(
            best_val > 0.0,
            # map current-plane local ids to their (already global) values
            np.array(
                [_plane_value(masks[i], b + 1) for b in best]
            ),
            0,
        )
        for k, idx in enumerate(ino):
            mmax += 1
            istitch[idx] = mmax
        lookup = np.zeros(int(masks[i + 1].max()) + 1, masks.dtype)
        # masks[i+1] ids are its dense ids 1..n
        ids_next = np.unique(masks[i + 1])
        ids_next = ids_next[ids_next > 0]
        for local_pos, gid in zip(range(1, len(ids_next) + 1), istitch):
            lookup[ids_next[local_pos - 1]] = gid
        masks[i + 1] = lookup[masks[i + 1]]
        mmax = max(mmax, int(masks[i + 1].max()))
    return masks


def _plane_value(plane: np.ndarray, dense_id: int) -> int:
    """Value in ``plane`` corresponding to the dense id used by
    pairwise_iou_matrix (which densifies by sorted unique order)."""
    ids = np.unique(plane)
    ids = ids[ids > 0]
    return int(ids[dense_id - 1]) if dense_id - 1 < len(ids) else 0


def compute_masks_3d(
    dP: np.ndarray,
    cellprob: np.ndarray,
    niter: int = 200,
    cellprob_threshold: float = 0.0,
    flow_threshold: float = 0.4,
    min_size: int = 15,
) -> np.ndarray:
    """3D instance recovery: trilinear flow-map composition squaring over
    (dZ, dY, dX), 3D convergence histogram, 3×3×3 label propagation, and
    size filtering (the 2D pipeline of classpose_tpu.dynamics lifted to 3D;
    flow-error QC is a 2D-only refinement, as in cellpose)."""
    import jax
    import jax.numpy as jnp

    dP = np.asarray(dP, np.float32)  # (3, Lz, Ly, Lx)
    cellprob = np.asarray(cellprob, np.float32)
    iscell = cellprob > cellprob_threshold
    if not iscell.any():
        return np.zeros(cellprob.shape, np.int32)

    p = _follow_flows_3d(jnp.asarray(dP), jnp.asarray(iscell), niter)
    raw = np.asarray(_get_masks_3d(p, jnp.asarray(iscell)))

    ids, remapped = np.unique(raw, return_inverse=True)
    masks = remapped.reshape(raw.shape).astype(np.int32)
    if ids[0] != 0:
        masks += 1
    if min_size > 0 and masks.max() > 0:
        counts = np.bincount(masks.ravel())
        small = counts < min_size
        small[0] = False
        masks[small[masks]] = 0
        ids2, rem2 = np.unique(masks, return_inverse=True)
        masks = rem2.reshape(masks.shape).astype(np.int32)
        if ids2[0] != 0:
            masks += 1
    return masks


def _trilinear(fields, pz, py, px):
    import jax.numpy as jnp

    _, Lz, Ly, Lx = fields.shape
    z0 = jnp.clip(jnp.floor(pz), 0, Lz - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(py), 0, Ly - 2).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(px), 0, Lx - 2).astype(jnp.int32)
    wz, wy, wx = pz - z0, py - y0, px - x0
    fl = fields.reshape(3, -1)
    base = (z0 * Ly + y0) * Lx + x0
    shp = pz.shape

    def take(off):
        return fl.take(base.ravel() + off, axis=1).reshape((3,) + shp)

    sy, sx = Lx, 1
    sz = Ly * Lx
    out = 0.0
    for dz, wz_ in ((0, 1 - wz), (1, wz)):
        for dy, wy_ in ((0, 1 - wy), (1, wy)):
            for dx, wx_ in ((0, 1 - wx), (1, wx)):
                out = out + take(dz * sz + dy * sy + dx * sx) * (
                    wz_ * wy_ * wx_
                )
    return out


def _follow_flows_3d(dP, iscell, niter):
    import jax
    import jax.numpy as jnp
    from functools import partial

    @partial(jax.jit, static_argnames=("n",))
    def run(dP, iscell, n):
        Lz, Ly, Lx = iscell.shape
        u = dP * iscell[None].astype(dP.dtype) / 5.0
        gz = jax.lax.broadcasted_iota(jnp.float32, iscell.shape, 0)
        gy = jax.lax.broadcasted_iota(jnp.float32, iscell.shape, 1)
        gx = jax.lax.broadcasted_iota(jnp.float32, iscell.shape, 2)

        def clamp(u):
            return jnp.stack(
                [
                    jnp.clip(gz + u[0], 0.0, Lz - 1.0) - gz,
                    jnp.clip(gy + u[1], 0.0, Ly - 1.0) - gy,
                    jnp.clip(gx + u[2], 0.0, Lx - 1.0) - gx,
                ]
            )

        u = clamp(u)
        k = max(1, int(np.ceil(np.log2(max(n, 2)))))
        for _ in range(k):
            s = _trilinear(u, gz + u[0], gy + u[1], gx + u[2])
            u = clamp(u + s)
        return jnp.stack([gz + u[0], gy + u[1], gx + u[2]])

    return run(dP, iscell, niter)


def _get_masks_3d(p, iscell, n_expand: int = 5):
    import jax
    import jax.numpy as jnp
    from functools import partial

    @partial(jax.jit, static_argnames=("n_expand",))
    def run(p, iscell, n_expand):
        Lz, Ly, Lx = iscell.shape
        fz = jnp.clip(jnp.round(p[0]), 0, Lz - 1).astype(jnp.int32)
        fy = jnp.clip(jnp.round(p[1]), 0, Ly - 1).astype(jnp.int32)
        fx = jnp.clip(jnp.round(p[2]), 0, Lx - 1).astype(jnp.int32)
        flat = ((fz * Ly + fy) * Lx + fx).ravel()
        h = (
            jnp.zeros(Lz * Ly * Lx, jnp.float32)
            .at[flat]
            .add(iscell.astype(jnp.float32).ravel())
            .reshape(Lz, Ly, Lx)
        )
        hmax = jax.lax.reduce_window(
            h, -jnp.inf, jax.lax.max, (3, 5, 5), (1, 1, 1), "SAME"
        )
        seeds = (h >= hmax) & (h > 10)
        idx3 = (
            jax.lax.broadcasted_iota(jnp.int32, h.shape, 0) * (Ly * Lx)
            + jax.lax.broadcasted_iota(jnp.int32, h.shape, 1) * Lx
            + jax.lax.broadcasted_iota(jnp.int32, h.shape, 2)
            + 1
        )
        seed_lab = jnp.where(seeds, idx3, 0)
        grow = h > 2

        def body(_, lab):
            m = jax.lax.reduce_window(
                lab, 0, jax.lax.max, (3, 3, 3), (1, 1, 1), "SAME"
            )
            lab = jnp.where(grow & (lab == 0), m, lab)
            return jnp.where(seeds, seed_lab, lab)

        lab = jax.lax.fori_loop(0, n_expand, body, seed_lab)
        masks = lab.ravel()[flat].reshape(iscell.shape)
        return jnp.where(iscell, masks, 0)

    return run(p, iscell, n_expand)
