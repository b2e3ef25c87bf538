"""H&E staining transform via NMF stain-matrix extraction + perturbation.

Capability parity with the reference ``HEStainingTransform``
(transforms/he_staining.py:47-278, the StarDist CoNIC recipe): estimate a
2-stain basis from the image's optical densities with sklearn NMF, perturb
the stain vectors and concentrations, and reconstruct the image.
"""

from __future__ import annotations

import numpy as np

from classpose_tpu.log import get_logger

logger = get_logger(__name__)


def extract_stain_matrix(
    rgb01: np.ndarray, n_stains: int = 2, od_threshold: float = 0.15,
    max_pixels: int = 50_000, seed: int = 0,
) -> tuple[np.ndarray, np.ndarray] | None:
    """Estimate (stain_matrix (n_stains, 3), concentrations (N, n_stains))
    from an RGB image in [0, 1] via NMF on thresholded optical densities."""
    from sklearn.decomposition import NMF

    od = -np.log(np.clip(rgb01.reshape(-1, 3), 1e-6, 1.0))
    mask = (od > od_threshold).any(axis=1)
    od_fg = od[mask]
    if od_fg.shape[0] < 100:
        return None
    if od_fg.shape[0] > max_pixels:
        idx = np.random.default_rng(seed).choice(
            od_fg.shape[0], max_pixels, replace=False
        )
        od_fit = od_fg[idx]
    else:
        od_fit = od_fg
    try:
        nmf = NMF(
            n_components=n_stains, init="random", random_state=seed,
            max_iter=200,
        )
        W = nmf.fit(od_fit)
        H = nmf.components_  # (n_stains, 3)
    except Exception as e:  # pragma: no cover
        logger.warning(f"NMF stain extraction failed: {e}")
        return None
    norms = np.linalg.norm(H, axis=1, keepdims=True)
    H = H / np.maximum(norms, 1e-8)
    # order stains: hematoxylin (more blue OD) first
    if H[0, 2] < H[1, 2]:
        H = H[::-1]
    return H, None


class HEStainingTransform:
    """Randomly perturb the image's own estimated H&E stain basis."""

    def __init__(
        self,
        sigma_matrix: float = 0.05,
        sigma_concentration: float = 0.2,
        p: float = 1.0,
        seed=None,
    ):
        self.sigma_matrix = sigma_matrix
        self.sigma_concentration = sigma_concentration
        self.p = p
        self.rng = np.random.default_rng(seed)

    def transform(self, img: np.ndarray) -> np.ndarray:
        if self.rng.random() > self.p:
            return img
        img = np.asarray(img, np.float32)
        chw = img.ndim == 3 and img.shape[0] in (1, 3)
        rgb = np.moveaxis(img, 0, -1) if chw else img
        shift = min(0.0, float(rgb.min()))
        rgb_pos = rgb - shift
        scale = float(rgb_pos.max())
        if scale <= 0:
            return img
        unit = np.clip(rgb_pos / scale, 1e-6, 1.0)

        est = extract_stain_matrix(
            unit, seed=int(self.rng.integers(0, 2**31))
        )
        if est is None:
            return img
        stain_matrix, _ = est
        od = -np.log(unit.reshape(-1, 3))
        conc, *_ = np.linalg.lstsq(stain_matrix.T, od.T, rcond=None)
        conc = np.maximum(conc, 0)  # (2, N)

        m_pert = stain_matrix * (
            1 + self.rng.normal(0, self.sigma_matrix, stain_matrix.shape)
        )
        c_pert = conc * (
            1 + self.rng.normal(0, self.sigma_concentration, (2, 1))
        )
        od_new = (m_pert.T @ c_pert).T.reshape(unit.shape)
        rgb_new = np.exp(-od_new)
        out = (np.clip(rgb_new, 0, 1) * scale + shift).astype(np.float32)
        return np.moveaxis(out, -1, 0) if chw else out

    __call__ = transform
