"""Device-side packed readback buffer: exact roundtrip through
_pack_fused_outputs / _unpack_fused_outputs in every format (int32,
plain int16 + class plane, class-folded int16)."""

import numpy as np

import jax.numpy as jnp


def _roundtrip(raw, class_pix, n_inst, win_ok, ncls, max_instances=4096):
    from classpose_tpu.runner.model import (
        _pack_fused_outputs,
        _unpack_fused_outputs,
    )

    buf = np.asarray(
        _pack_fused_outputs(
            jnp.asarray(class_pix), jnp.asarray(raw), jnp.asarray(n_inst),
            jnp.asarray(win_ok), ncls, max_instances=max_instances,
        )
    )
    return _unpack_fused_outputs(
        buf, raw.shape[1], raw.dtype == np.int16, ncls, max_instances
    )


def test_packed_class_int16_roundtrip():
    rng = np.random.default_rng(0)
    B, S, ncls = 3, 64, 7
    raw = rng.integers(0, 4096, size=(B, S, S)).astype(np.int16)
    cls = rng.integers(0, ncls, size=(B, S, S)).astype(np.int8)
    n_inst = np.array([5, 4095, 0], np.int32)
    win_ok = np.array([True, False, True])

    cp, r, ni, wo = _roundtrip(raw, cls, n_inst, win_ok, ncls)
    np.testing.assert_array_equal(r, raw)
    np.testing.assert_array_equal(cp, cls)
    np.testing.assert_array_equal(ni, n_inst)
    np.testing.assert_array_equal(wo, win_ok)
    # the folded format must actually be 2 bytes/px (no class plane)
    from classpose_tpu.runner.model import _pack_class_in_labels

    assert _pack_class_in_labels(True, ncls)


def test_packed_class_16way_boundary():
    # ncls=16 uses all 4 class bits; ids up to 4095 use all 12 id bits
    B, S, ncls = 1, 16, 16
    raw = np.full((B, S, S), 4095, np.int16)
    cls = np.full((B, S, S), 15, np.int8)
    cp, r, _, _ = _roundtrip(
        raw, cls, np.array([4095], np.int32), np.array([True]), ncls
    )
    np.testing.assert_array_equal(r, raw)
    np.testing.assert_array_equal(cp, cls)


def test_qc_max_instances_scales_with_area():
    """K grows with tile area (density basis 4000/Mpx) but stays capped
    at 8192 so the packed int16 readback keeps ≥3 class bits."""
    from classpose_tpu.runner.model import qc_max_instances

    assert qc_max_instances(1024 * 1024) == 4096
    assert qc_max_instances(1280 * 1280) == 8192
    assert qc_max_instances(2560 * 2560) == 8192  # capped


def test_packed_class_13bit_ids_roundtrip():
    # K=8192 → 13 id bits, 3 class bits (ncls ≤ 8)
    B, S, ncls = 1, 16, 6
    raw = np.full((B, S, S), 8191, np.int16)
    cls = np.full((B, S, S), ncls - 1, np.int8)
    cp, r, _, _ = _roundtrip(
        raw, cls, np.array([8191], np.int32), np.array([True]), ncls,
        max_instances=8192,
    )
    np.testing.assert_array_equal(r, raw)
    np.testing.assert_array_equal(cp, cls)
    from classpose_tpu.runner.model import _pack_class_in_labels

    assert _pack_class_in_labels(True, 6, 8192)
    # 13 id bits leave only 3 class bits — 16-class models fall back to
    # the separate class plane at K=8192
    assert not _pack_class_in_labels(True, 16, 8192)


def test_plain_int16_single_class():
    rng = np.random.default_rng(1)
    B, S = 2, 32
    raw = rng.integers(0, 30000, size=(B, S, S)).astype(np.int16)
    cls = np.zeros((B, S, S), np.int8)
    cp, r, ni, wo = _roundtrip(
        raw, cls, np.array([7, 8], np.int32), np.array([True, True]), 1
    )
    np.testing.assert_array_equal(r, raw)
    assert cp is None


def test_int32_scatter_format_keeps_class_plane():
    rng = np.random.default_rng(2)
    B, S, ncls = 2, 32, 7
    raw = rng.integers(0, 100000, size=(B, S, S)).astype(np.int32)
    cls = rng.integers(0, ncls, size=(B, S, S)).astype(np.int8)
    cp, r, ni, wo = _roundtrip(
        raw, cls, np.array([3, 1], np.int32), np.array([True, True]), ncls
    )
    np.testing.assert_array_equal(r, raw)
    np.testing.assert_array_equal(cp, cls)
