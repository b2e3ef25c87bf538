"""Geometric training augmentation: random rotate / scale / flip / crop.

Functional equivalent of cellpose ``transforms.random_rotate_and_resize``
as used by the reference per-item pipeline (dataset.py:23-56): a random
affine (rotation θ∈[0,2π), scale ∈ 1±scale_range/2 divided by the
diameter-rescale factor, horizontal flip, random translation) crops the
sample to (bsize, bsize) and transforms the label channels consistently —
flow vectors are rotated/flipped with the same linear map, the class
channel is warped with nearest-neighbor (it holds categorical ids and −100
sentinels), binary/flows with bilinear.
"""

from __future__ import annotations

import numpy as np


def random_rotate_and_resize(
    img: np.ndarray,
    lbl: np.ndarray | None,
    rescale: float = 1.0,
    scale_range: float = 0.5,
    xy: tuple[int, int] = (256, 256),
    rng: np.random.Generator | None = None,
) -> tuple[np.ndarray, np.ndarray | None, float]:
    """Apply one random affine to (C, H, W) image + (4, H, W) label.

    Returns (img_out (C, *xy), lbl_out (4, *xy), scale)."""
    import cv2

    rng = rng or np.random.default_rng()
    C, H, W = img.shape
    ds = scale_range
    scale = rng.uniform(1 - ds / 2, 1 + ds / 2)
    if rescale and rescale > 0:
        scale = scale / rescale
    theta = rng.uniform(0, 2 * np.pi)
    flip = rng.random() > 0.5

    cos, sin = np.cos(theta), np.sin(theta)
    A = scale * np.array([[cos, -sin], [sin, cos]])
    if flip:
        A = A @ np.array([[-1.0, 0.0], [0.0, 1.0]])

    # pick a random source center such that the output window stays inside
    # the source as much as possible
    out_w, out_h = xy[1], xy[0]
    half_span = (
        np.abs(A) @ np.array([out_w / 2, out_h / 2])
    )  # conservative bound of the source-space footprint
    cx_lo, cx_hi = half_span[0] / scale, W - half_span[0] / scale
    cy_lo, cy_hi = half_span[1] / scale, H - half_span[1] / scale
    cx = rng.uniform(min(cx_lo, cx_hi), max(cx_lo, cx_hi))
    cy = rng.uniform(min(cy_lo, cy_hi), max(cy_lo, cy_hi))
    cx = float(np.clip(cx, 0, W))
    cy = float(np.clip(cy, 0, H))

    # dest center is the output center; M maps source → dest
    M = np.zeros((2, 3))
    M[:2, :2] = A
    M[:, 2] = [out_w / 2 - (A[0, 0] * cx + A[0, 1] * cy),
               out_h / 2 - (A[1, 0] * cx + A[1, 1] * cy)]

    def warp(ch, nearest=False, border=0.0):
        return cv2.warpAffine(
            ch.astype(np.float32),
            M,
            (out_w, out_h),
            flags=cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR,
            borderMode=cv2.BORDER_CONSTANT,
            borderValue=border,
        )

    img_out = np.stack([warp(img[c]) for c in range(C)])

    lbl_out = None
    if lbl is not None:
        chans = []
        for k in range(lbl.shape[0]):
            is_class = k == 0 and lbl.shape[0] >= 2
            chans.append(warp(lbl[k], nearest=is_class))
        lbl_out = np.stack(chans)
        if lbl.shape[0] >= 4:
            # rotate flow vectors: stored as (flow_y, flow_x) = (vy, vx);
            # the affine maps (x, y) → A @ (x, y), so the vector
            # (vx, vy) → A @ (vx, vy)
            vy, vx = lbl_out[-2].copy(), lbl_out[-1].copy()
            new_vx = A[0, 0] * vx + A[0, 1] * vy
            new_vy = A[1, 0] * vx + A[1, 1] * vy
            norm = np.sqrt(new_vx**2 + new_vy**2)
            scale_back = np.where(norm > 0, 1.0, 0.0)
            # keep unit magnitude where flows existed
            old_norm = np.sqrt(vx**2 + vy**2)
            with np.errstate(divide="ignore", invalid="ignore"):
                unit = np.where(
                    norm > 1e-12, old_norm / np.maximum(norm, 1e-12), 0.0
                )
            lbl_out[-2] = new_vy * unit * scale_back
            lbl_out[-1] = new_vx * unit * scale_back
    return img_out, lbl_out, float(scale)
