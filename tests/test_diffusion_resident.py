"""Parity tests for the whole-tile VMEM-resident diffusion kernel
(ops/diffusion_pallas.py diffuse_resident_pallas, r5).

The kernel claims BIT-IDENTICAL results to the XLA stencil in
dynamics/flows._diffuse_dyn (same Σ-over-_SHIFTS9 term order, masks are
exact 0/1 factors, border semantics match the zero pad). These tests pin
that on the CPU interpret path, including the vmap batching the fused QC
relies on (per-tile niter as a batched SMEM scalar).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from classpose_tpu.ops.diffusion_pallas import (
    diffuse_resident_pallas,
    resident_diffusion_supported,
)


def _xla_reference(ids, center, niter):
    """The XLA stencil, forced (no Pallas dispatch)."""
    from classpose_tpu.dynamics import flows

    H, W = ids.shape
    ids = jnp.asarray(ids, jnp.int32)
    ids_p = jnp.pad(ids, 1)
    fg = ids > 0
    center = jnp.asarray(center, jnp.float32) * fg

    def neighbor_mean(T):
        Tp = jnp.pad(T, 1)
        acc = jnp.zeros((H, W), jnp.float32)
        for dy, dx in flows._SHIFTS9:
            nb_T = Tp[1 + dy : 1 + dy + H, 1 + dx : 1 + dx + W]
            nb_id = ids_p[1 + dy : 1 + dy + H, 1 + dx : 1 + dx + W]
            acc = acc + jnp.where(nb_id == ids, nb_T, 0.0)
        return acc / 9.0

    def body(_, T):
        T = T + center
        return jnp.where(fg, neighbor_mean(T), 0.0)

    return jax.lax.fori_loop(
        0, niter, body, jnp.zeros((H, W), jnp.float32)
    )


def _blob_field(H, W, n, seed=0):
    """Random touching-instance label field + one center px per blob."""
    rng = np.random.default_rng(seed)
    ids = np.zeros((H, W), np.int32)
    center = np.zeros((H, W), np.float32)
    for k in range(1, n + 1):
        cy, cx = rng.integers(2, H - 2), rng.integers(2, W - 2)
        r = int(rng.integers(2, 6))
        yy, xx = np.ogrid[:H, :W]
        m = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
        ids[m] = k
        center[cy, cx] = 1.0
    return ids, center


def test_resident_matches_xla_bitwise():
    H, W = 64, 128
    assert resident_diffusion_supported(H, W)
    ids, center = _blob_field(H, W, 12)
    for niter in (1, 7, 40):
        ref = np.asarray(_xla_reference(ids, center, niter))
        got = np.asarray(
            diffuse_resident_pallas(
                jnp.asarray(ids), jnp.asarray(center),
                jnp.int32(niter), interpret=True,
            )
        )
        np.testing.assert_array_equal(got, ref)


def test_vmap_batching_with_per_tile_niter():
    """The fused QC calls the kernel under jax.vmap with a traced
    per-tile niter — the pallas batching rule must deliver each tile its
    own count."""
    H, W = 64, 128
    tiles = [_blob_field(H, W, 8, seed=s) for s in range(3)]
    ids = jnp.asarray(np.stack([t[0] for t in tiles]))
    cen = jnp.asarray(np.stack([t[1] for t in tiles]))
    niters = jnp.asarray([5, 17, 40], jnp.int32)

    got = jax.vmap(
        lambda i, c, n: diffuse_resident_pallas(i, c, n, interpret=True)
    )(ids, cen, niters)

    for b in range(3):
        ref = np.asarray(
            _xla_reference(np.asarray(ids[b]), np.asarray(cen[b]),
                           int(niters[b]))
        )
        np.testing.assert_array_equal(np.asarray(got[b]), ref)


def test_dispatch_through_diffuse_dyn(monkeypatch):
    """_diffuse_dyn routes to the resident kernel in interpret mode and
    the result matches the off-mode XLA path exactly."""
    monkeypatch.setenv("CLASSPOSE_PALLAS_DIFFUSION", "interpret")
    from classpose_tpu.dynamics.flows import _diffuse_dyn

    ids, center = _blob_field(64, 128, 10, seed=3)
    got = np.asarray(_diffuse_dyn(jnp.asarray(ids), jnp.asarray(center),
                                  jnp.int32(23)))
    monkeypatch.setenv("CLASSPOSE_PALLAS_DIFFUSION", "off")
    ref = np.asarray(_diffuse_dyn(jnp.asarray(ids), jnp.asarray(center),
                                  jnp.int32(23)))
    np.testing.assert_array_equal(got, ref)


def test_unsupported_geometry_gate():
    assert not resident_diffusion_supported(63, 128)   # H % 8
    assert not resident_diffusion_supported(64, 100)   # W % 128
    assert not resident_diffusion_supported(4096, 4096)  # VMEM
    assert resident_diffusion_supported(1024, 1024)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
