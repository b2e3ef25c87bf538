"""Direct interpret-mode coverage of the Pallas stripe kernels
(ops/sample_pallas.py): the bounded-displacement bilinear sampler, the
C=1 integer-position (nearest) sample, and the scatter-count histogram.

These exercise the kernels THEMSELVES (jax.clear_caches between mode
switches where needed) — the follow_flows-level test alone can silently
hit the jit cache of the other mode.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from classpose_tpu.ops.sample_pallas import (
    sampler_supported,
    scatter_count_pallas,
    shift_sample_pallas,
)

H, W = 64, 128


def _positions(rng, max_disp=2.5):
    gy = np.arange(H, dtype=np.float32)[:, None] + np.zeros((1, W), np.float32)
    gx = np.arange(W, dtype=np.float32)[None, :] + np.zeros((H, 1), np.float32)
    py = np.clip(gy + rng.uniform(-max_disp, max_disp, (H, W)), 0, H - 1)
    px = np.clip(gx + rng.uniform(-max_disp, max_disp, (H, W)), 0, W - 1)
    return py.astype(np.float32), px.astype(np.float32)


def _bilinear_ref(u, py, px):
    """Flat four-corner bilinear reference (same math as dynamics
    _bilinear2)."""
    y0 = np.clip(np.floor(py), 0, H - 2).astype(np.int64)
    x0 = np.clip(np.floor(px), 0, W - 2).astype(np.int64)
    wy = py - y0
    wx = px - x0
    out = np.empty_like(u)
    for c in range(u.shape[0]):
        f = u[c]
        out[c] = (
            f[y0, x0] * (1 - wy) * (1 - wx)
            + f[y0, x0 + 1] * (1 - wy) * wx
            + f[y0 + 1, x0] * wy * (1 - wx)
            + f[y0 + 1, x0 + 1] * wy * wx
        )
    return out


def test_shift_sample_matches_bilinear():
    assert sampler_supported(H, W, 4, 2)
    rng = np.random.default_rng(0)
    u = rng.normal(size=(1, 2, H, W)).astype(np.float32)
    py, px = _positions(rng)
    out = np.asarray(
        shift_sample_pallas(
            jnp.asarray(u), jnp.asarray(py)[None], jnp.asarray(px)[None],
            D=4, interpret=True,
        )
    )[0]
    ref = _bilinear_ref(u[0], py, px)
    # factored two-level lerp vs flat four-term sum: float-tolerance only
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_shift_sample_c1_integer_positions_exact():
    """C=1 label sampling at integer positions is an EXACT nearest
    gather (bilinear weights are exactly 0/1) — the get_masks final
    label lookup relies on this."""
    assert sampler_supported(H, W, 4, 1)
    rng = np.random.default_rng(1)
    lab = rng.integers(0, 5000, size=(H, W)).astype(np.int32)
    fy = np.clip(
        np.arange(H)[:, None] + rng.integers(-3, 4, (H, W)), 0, H - 1
    ).astype(np.int32)
    fx = np.clip(
        np.arange(W)[None, :] + rng.integers(-3, 4, (H, W)), 0, W - 1
    ).astype(np.int32)
    out = np.asarray(
        shift_sample_pallas(
            jnp.asarray(lab.astype(np.float32))[None, None],
            jnp.asarray(fy.astype(np.float32))[None],
            jnp.asarray(fx.astype(np.float32))[None],
            D=4, interpret=True,
        )
    )[0, 0].astype(np.int32)
    np.testing.assert_array_equal(out, lab[fy, fx])


def test_scatter_count_matches_scatter():
    rng = np.random.default_rng(2)
    fy = np.clip(
        np.arange(H)[:, None] + rng.integers(-3, 4, (H, W)), 0, H - 1
    ).astype(np.int32)
    fx = np.clip(
        np.arange(W)[None, :] + rng.integers(-3, 4, (H, W)), 0, W - 1
    ).astype(np.int32)
    cell = (rng.uniform(size=(H, W)) < 0.7).astype(np.float32)
    out = np.asarray(
        scatter_count_pallas(
            jnp.asarray(fy)[None], jnp.asarray(fx)[None],
            jnp.asarray(cell)[None], D=4, interpret=True,
        )
    )[0]
    ref = np.zeros((H, W), np.float32)
    np.add.at(ref, (fy.ravel(), fx.ravel()), cell.ravel())
    np.testing.assert_array_equal(out, ref)


def test_scatter_count_edge_landing():
    """Pixels landing on image borders (and the zeroed halo margins of
    the first/last stripe) must count correctly."""
    fy = np.zeros((H, W), np.int32)            # everything lands on row 0
    fx = np.broadcast_to(np.arange(W, dtype=np.int32), (H, W)).copy()
    cell = np.ones((H, W), np.float32)
    # displacement bound: rows 0..3 land within D-1=3
    cell[4:] = 0.0
    out = np.asarray(
        scatter_count_pallas(
            jnp.asarray(fy)[None], jnp.asarray(fx)[None],
            jnp.asarray(cell)[None], D=4, interpret=True,
        )
    )[0]
    ref = np.zeros((H, W), np.float32)
    ref[0] = 4.0  # 4 source rows per column
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("return_seeds", [False, True])
def test_get_masks_batched_pallas_matches_xla(monkeypatch, return_seeds):
    """get_masks_from_positions_batched: Pallas histogram+sample path vs
    XLA scatter/gather path — EXACT equality (integer arithmetic on both
    sides). 256x256 so the production D=64 halo fits the geometry."""
    from classpose_tpu.dynamics.masks import (
        follow_flows_batched,
        get_masks_from_positions_batched,
    )
    from classpose_tpu.dynamics.flows import masks_to_flows
    from tests.test_dynamics import make_disks

    gt = make_disks(
        shape=(256, 256),
        centers=((60, 60), (180, 200), (200, 70)),
        radius=22,
    )
    mu = np.asarray(masks_to_flows(gt))
    dP = (5.0 * mu).astype(np.float32)[None]
    iscell = (gt > 0)[None]

    monkeypatch.setenv("CLASSPOSE_PALLAS_SAMPLER", "off")
    jax.clear_caches()
    p = follow_flows_batched(jnp.asarray(dP), jnp.asarray(iscell),
                             niter=40)
    ref = get_masks_from_positions_batched(
        p, jnp.asarray(iscell), return_seeds=return_seeds
    )
    monkeypatch.setenv("CLASSPOSE_PALLAS_SAMPLER", "interpret")
    jax.clear_caches()
    pal = get_masks_from_positions_batched(
        p, jnp.asarray(iscell), return_seeds=return_seeds
    )
    if return_seeds:
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(pal[0]))
        np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(pal[1]))
        assert int(np.asarray(ref[1]).max()) == 3  # all three seeds found
    else:
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(pal))
        assert len(np.unique(np.asarray(ref))) == 4  # 3 instances + bg


def test_extended_vmem_budget_geometries():
    """Production tile widths past 1024 need the extended VMEM budget at
    the late composition bounds (D up to 146): the strict 16 MB-limit
    budget rejects them, the extended one (with vmem_limit_bytes raised
    on the pallas_call) admits them. Without this the sampler fell back
    to the XLA gather whose padded bilinear-footprint temp is 12.5 GB at
    1280²x4 — an instant HBM OOM (r4 geometry A/B)."""
    from classpose_tpu.ops.sample_pallas import (
        _VMEM_BUDGET,
        _kernel_vmem_bytes,
        _pick_row_block,
        _vmem_limit,
    )

    for Wt in (1280, 1920, 2560):
        assert sampler_supported(Wt, Wt, 146, 2), Wt
        assert sampler_supported(Wt, Wt, 146, 3), Wt
    # 1024 keeps its strict-budget behavior (default Mosaic limit)
    Dh = -(-146 // 8) * 8
    R1024 = _pick_row_block(1024, 1024, Dh, 2)
    assert _kernel_vmem_bytes(R1024, 1024, Dh, 2) <= _VMEM_BUDGET
    assert _vmem_limit(R1024, 1024, Dh, 2) is None
    # 1280+ land in the extended band and get the raised limit
    R1280 = _pick_row_block(1280, 1280, Dh, 2)
    assert _vmem_limit(R1280, 1280, Dh, 2) is not None


def test_shift_sample_extended_budget_correct():
    """Interpret-mode correctness of a geometry that lands in the
    EXTENDED VMEM band (H=312, W=1280, D=146 → R=8, ~13.3 MB estimate):
    same bilinear math as every other geometry."""
    from classpose_tpu.ops.sample_pallas import (
        _VMEM_BUDGET,
        _kernel_vmem_bytes,
        _pick_row_block,
    )

    Ht, Wt, D = 312, 1280, 146
    Dh = -(-D // 8) * 8
    R = _pick_row_block(Ht, Wt, Dh, 2)
    assert R is not None
    assert _kernel_vmem_bytes(R, Wt, Dh, 2) > _VMEM_BUDGET  # extended band

    rng = np.random.default_rng(3)
    u = rng.normal(size=(1, 2, Ht, Wt)).astype(np.float32)
    gy = np.arange(Ht, dtype=np.float32)[:, None] + np.zeros((1, Wt), np.float32)
    gx = np.arange(Wt, dtype=np.float32)[None, :] + np.zeros((Ht, 1), np.float32)
    py = np.clip(gy + rng.uniform(-2.5, 2.5, (Ht, Wt)), 0, Ht - 1).astype(np.float32)
    px = np.clip(gx + rng.uniform(-2.5, 2.5, (Ht, Wt)), 0, Wt - 1).astype(np.float32)
    out = np.asarray(
        shift_sample_pallas(
            jnp.asarray(u), jnp.asarray(py)[None], jnp.asarray(px)[None],
            D=D, interpret=True,
        )
    )[0]
    y0 = np.clip(np.floor(py), 0, Ht - 2).astype(np.int64)
    x0 = np.clip(np.floor(px), 0, Wt - 2).astype(np.int64)
    wy, wx = py - y0, px - x0
    ref = np.stack([
        u[0, c][y0, x0] * (1 - wy) * (1 - wx)
        + u[0, c][y0, x0 + 1] * (1 - wy) * wx
        + u[0, c][y0 + 1, x0] * wy * (1 - wx)
        + u[0, c][y0 + 1, x0 + 1] * wy * wx
        for c in range(2)
    ])
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)
