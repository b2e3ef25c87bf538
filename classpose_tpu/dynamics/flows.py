"""Ground-truth flow fields from instance masks (cellpose
``masks_to_flows`` / ``labels_to_flows`` equivalents).

Whole-image vectorized reformulation of the cellpose GPU algorithm
(`masks_to_flows_gpu`), as required by the reference at
train_utils.py:233-254 (training targets) and for flow-error QC
(remove_bad_flow_masks):

1. every instance gets a "center" pixel — the in-mask pixel closest to the
   instance centroid;
2. heat diffusion: at every iteration a unit source is injected at each
   center, then T ← (1/9)·Σ T over the 9-neighborhood *restricted to
   same-instance pixels* (out-of-instance neighbors contribute 0);
3. flows = central difference of log1p(T) (unmasked, T = 0 outside
   instances, exactly like the cellpose GPU path), normalized to unit
   vectors over instance pixels.

The diffusion loop is a ``lax.fori_loop`` of shifted elementwise ops —
VPU-friendly, static shapes. ``max_id`` and ``niter`` are bucketed by the
host wrapper to bound recompilation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_BIG_I32 = np.int32(2**31 - 1)


def instance_centers(
    masks: jnp.ndarray, max_id: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-instance center pixels (nearest in-mask pixel to the centroid).

    Returns ``(centers, present)``: centers (max_id+1, 2) int32 (row, col)
    and present (max_id+1,) bool. Background entry 0 is always absent.
    """
    H, W = masks.shape
    ids = masks.astype(jnp.int32).ravel()
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0).ravel()
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1).ravel()
    fg = (ids > 0).astype(jnp.float32)
    n = jnp.zeros(max_id + 1).at[ids].add(fg)
    sy = jnp.zeros(max_id + 1).at[ids].add(yy * fg)
    sx = jnp.zeros(max_id + 1).at[ids].add(xx * fg)
    cy = sy / jnp.maximum(n, 1.0)
    cx = sx / jnp.maximum(n, 1.0)
    d = (yy - cy[ids]) ** 2 + (xx - cx[ids]) ** 2
    d = jnp.where(ids > 0, d, jnp.inf)
    dmin = (
        jnp.full(max_id + 1, jnp.inf, jnp.float32).at[ids].min(d)
    )
    # among pixels achieving (approximately) dmin, take the smallest index
    flat = yy * W + xx
    eligible = (ids > 0) & (d <= dmin[ids] + 1e-3)
    cand = jnp.where(eligible, flat, _BIG_I32)
    best = jnp.full(max_id + 1, _BIG_I32, jnp.int32).at[ids].min(cand)
    present = (n > 0) & (jnp.arange(max_id + 1) > 0)
    best = jnp.where(present, best, 0)
    centers = jnp.stack([best // W, best % W], axis=-1).astype(jnp.int32)
    return centers, present


_SHIFTS9 = [
    (-1, -1), (-1, 0), (-1, 1),
    (0, -1), (0, 0), (0, 1),
    (1, -1), (1, 0), (1, 1),
]


@partial(jax.jit, static_argnames=("max_id", "niter"))
def masks_to_flows(
    masks: jnp.ndarray, max_id: int, niter: int = 200
) -> jnp.ndarray:
    """(H, W) instance labels → (2, H, W) unit flow field [dy, dx].

    ``max_id``: static upper bound on instance ids (ids above it must not
    occur). ``niter``: diffusion length; needs ≳ 2× the largest instance
    diameter to converge (cellpose's horizon).
    """
    H, W = masks.shape
    ids = masks.astype(jnp.int32)
    centers, present = instance_centers(ids, max_id)
    center_map = (
        jnp.zeros((H, W), jnp.float32)
        .at[centers[:, 0], centers[:, 1]]
        .add(present.astype(jnp.float32))
    )
    ids_p = jnp.pad(ids, 1)
    fg = ids > 0

    def neighbor_mean(T):
        Tp = jnp.pad(T, 1)
        acc = jnp.zeros((H, W), jnp.float32)
        for dy, dx in _SHIFTS9:
            nb_T = Tp[1 + dy : 1 + dy + H, 1 + dx : 1 + dx + W]
            nb_id = ids_p[1 + dy : 1 + dy + H, 1 + dx : 1 + dx + W]
            acc = acc + jnp.where(nb_id == ids, nb_T, 0.0)
        return acc / 9.0

    def body(_, T):
        T = T + center_map
        return jnp.where(fg, neighbor_mean(T), 0.0)

    T = jax.lax.fori_loop(0, niter, body, jnp.zeros((H, W), jnp.float32))

    logT = jnp.log1p(T)
    Tp = jnp.pad(logT, 1)
    dy = (Tp[2 : 2 + H, 1 : 1 + W] - Tp[0:H, 1 : 1 + W]) / 2.0
    dx = (Tp[1 : 1 + H, 2 : 2 + W] - Tp[1 : 1 + H, 0:W]) / 2.0
    mag = jnp.sqrt(dy**2 + dx**2)
    mu = jnp.stack([dy, dx]) / jnp.maximum(mag, 1e-20)
    return jnp.where(fg[None], mu, 0.0).astype(jnp.float32)


def _bucket(v: int, q: int) -> int:
    return int(q * np.ceil(max(v, 1) / q))


def labels_to_flows(
    labels: np.ndarray, niter: int | None = None
) -> np.ndarray:
    """Instance label image → (4, H, W) float32 training target
    ``[instance, binary, flow_y, flow_x]`` (cellpose ``labels_to_flows``
    contract used at reference train_utils.py:233-254).

    Instance ids are densified first; ``max_id``/``niter`` are bucketed so
    repeated calls with similar inputs reuse compiled programs.
    """
    labels = np.asarray(labels)
    if labels.ndim != 2:
        raise ValueError(f"expected 2D instance labels, got {labels.shape}")
    ids, remapped = np.unique(labels, return_inverse=True)
    remapped = remapped.reshape(labels.shape).astype(np.int32)
    if ids[0] != 0:  # no background pixel present
        remapped += 1
    max_id = int(remapped.max())
    if max_id == 0:
        z = np.zeros(labels.shape, np.float32)
        return np.stack([z, z, z, z])
    if niter is None:
        niter = 2 * _max_instance_extent(remapped)
    niter = _bucket(min(max(niter, 60), 1200), 50)
    mu = np.asarray(
        masks_to_flows(jnp.asarray(remapped), _bucket(max_id, 64), niter)
    )
    binary = (remapped > 0).astype(np.float32)
    return np.stack([remapped.astype(np.float32), binary, mu[0], mu[1]])


def _max_instance_extent(masks: np.ndarray) -> int:
    from scipy import ndimage

    ext = 1
    for sl in ndimage.find_objects(masks):
        if sl is None:
            continue
        ext = max(ext, sl[0].stop - sl[0].start, sl[1].stop - sl[1].start)
    return int(ext)
