"""Regenerate the golden fixtures after a DELIBERATE semantics change.

Run on CPU: JAX_PLATFORMS=cpu python tests/golden/regenerate.py
"""

import jax

jax.config.update("jax_platforms", "cpu")

from pathlib import Path

import numpy as np

from classpose_tpu.dynamics import compute_masks, labels_to_flows


def main():
    rng = np.random.default_rng(42)
    gt = np.zeros((160, 160), np.int32)
    yy, xx = np.mgrid[:160, :160]
    k = 0
    for cy in range(20, 150, 34):
        for cx in range(20, 150, 34):
            k += 1
            r = rng.integers(8, 13)
            gt[((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r) & (gt == 0)] = k
    flows = labels_to_flows(gt)
    dP = 5.0 * flows[2:4]
    cp = np.where(gt > 0, 6.0, -6.0).astype(np.float32)
    masks = compute_masks(dP, cp, niter=100)
    np.savez_compressed(
        Path(__file__).parent / "dynamics_golden.npz",
        gt=gt, flows=flows.astype(np.float32), dP=dP.astype(np.float32),
        cellprob=cp, masks=masks.astype(np.int32),
    )
    print("regenerated:", masks.max(), "instances")


if __name__ == "__main__":
    main()
