"""Golden regression tests: frozen inputs → frozen outputs for the
deterministic kernels (flows + mask recovery). Catches unintended behavior
drift across refactors; regenerate deliberately with
tests/golden/regenerate.py when semantics change on purpose."""

from pathlib import Path

import numpy as np

GOLDEN = Path(__file__).parent / "golden" / "dynamics_golden.npz"


def test_flows_golden():
    from classpose_tpu.dynamics import labels_to_flows

    z = np.load(GOLDEN)
    flows = labels_to_flows(z["gt"])
    np.testing.assert_allclose(flows, z["flows"], atol=2e-5)


def test_mask_recovery_golden():
    from classpose_tpu.dynamics import compute_masks

    z = np.load(GOLDEN)
    masks = compute_masks(z["dP"], z["cellprob"], niter=100)
    # identical label maps (sequential relabeling is deterministic)
    np.testing.assert_array_equal(masks, z["masks"])
