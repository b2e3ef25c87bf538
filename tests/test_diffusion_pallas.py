"""Interpret-mode parity of the halo-blocked Pallas diffusion kernel vs
the XLA reference path (the compiled kernel runs on TPU only; bit-exact
equality was also verified there — see the module docstring)."""

import numpy as np
import jax
import jax.numpy as jnp

from classpose_tpu.dynamics.flows import _diffuse_dyn, instance_center_map
from classpose_tpu.ops.diffusion_pallas import diffuse_pallas


def test_pallas_diffusion_matches_xla_interpret():
    rng = np.random.default_rng(0)
    H = W = 96
    B = 3
    masks = np.zeros((B, H, W), np.int32)
    yy, xx = np.mgrid[:H, :W]
    for b in range(B):
        for i in range(6):
            cy, cx = rng.integers(10, 85, 2)
            m = (yy - cy) ** 2 + (xx - cx) ** 2 <= rng.integers(25, 100)
            masks[b][m] = cy * W + cx + 1  # raw (non-dense) label style
    cms = np.stack([instance_center_map(m) for m in masks])
    # mixed per-tile horizons exercise the active-flag predication
    niters = jnp.array([40, 120, 80], jnp.int32)

    ref = np.stack([
        np.asarray(_diffuse_dyn(jnp.asarray(masks[b]), jnp.asarray(cms[b]),
                                int(niters[b])))
        for b in range(B)
    ])
    out = np.asarray(diffuse_pallas(
        jnp.zeros((B, H, W), jnp.float32), jnp.asarray(masks),
        jnp.asarray(cms), niters, k=40, bs=32, interpret=True,
    ))
    np.testing.assert_allclose(out, ref, atol=1e-6)
    assert ref.max() > 0  # non-vacuous
