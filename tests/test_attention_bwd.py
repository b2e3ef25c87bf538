"""Parity test: Pallas flash-style attention backward vs the XLA
reference backward (nn/attention.py _attn_bwd_pallas, r5).

The custom_vjp's backward previously always recomputed attention with
plain-XLA math and pulled the cotangent through jax.vjp — materializing
the (L, L) logits and probabilities in HBM per layer. The Pallas
backward recomputes them in VMEM per (batch, head-pair) block. Grads
must match the reference vjp (same math, different association order) —
checked here at f32 in interpret mode.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from classpose_tpu.nn.attention import _attn_core, _attn_core_ref

B, n, hd, H, W = 2, 2, 64, 8, 8
L = H * W
SCALE = float(hd) ** -0.5


def _operands(seed=0):
    rng = np.random.default_rng(seed)
    qkv = jnp.asarray(
        rng.normal(size=(B, L, 3 * n * hd)).astype(np.float32) * 0.3
    )
    rel = jnp.asarray(
        rng.normal(size=(B, L, n, H + W)).astype(np.float32) * 0.3
    )
    wout = jnp.asarray(
        rng.normal(size=(B, L, n * hd)).astype(np.float32)
    )
    return qkv, rel, wout


def _loss_pallas(qkv, rel, wout):
    out = _attn_core(qkv, rel, SCALE, (H, W), n, 2, True)
    return jnp.sum(out.reshape(wout.shape) * wout)


def _loss_ref(qkv, rel, wout):
    out = _attn_core_ref(qkv, rel, SCALE, (H, W), n)
    return jnp.sum(out * wout)


def test_bwd_matches_reference_vjp(monkeypatch):
    monkeypatch.setenv("CLASSPOSE_ATTN_BWD", "pallas")
    qkv, rel, wout = _operands()

    gq_p, gr_p = jax.grad(_loss_pallas, argnums=(0, 1))(qkv, rel, wout)
    gq_r, gr_r = jax.grad(_loss_ref, argnums=(0, 1))(qkv, rel, wout)

    np.testing.assert_allclose(
        np.asarray(gq_p), np.asarray(gq_r), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(gr_p), np.asarray(gr_r), rtol=2e-4, atol=2e-5
    )


def test_bwd_env_xla_path_unchanged(monkeypatch):
    """CLASSPOSE_ATTN_BWD=xla keeps the original vjp-through-reference
    backward (the A/B baseline for tools/bench_train.py)."""
    monkeypatch.setenv("CLASSPOSE_ATTN_BWD", "xla")
    qkv, rel, wout = _operands(1)
    gq_x, gr_x = jax.grad(_loss_pallas, argnums=(0, 1))(qkv, rel, wout)
    gq_r, gr_r = jax.grad(_loss_ref, argnums=(0, 1))(qkv, rel, wout)
    np.testing.assert_allclose(
        np.asarray(gq_x), np.asarray(gq_r), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(gr_x), np.asarray(gr_r), rtol=1e-6, atol=1e-7
    )


def test_forward_value_unaffected(monkeypatch):
    monkeypatch.setenv("CLASSPOSE_ATTN_BWD", "pallas")
    qkv, rel, wout = _operands(2)
    got = _attn_core(qkv, rel, SCALE, (H, W), n, 2, True)
    ref = _attn_core_ref(qkv, rel, SCALE, (H, W), n)
    np.testing.assert_allclose(
        np.asarray(got).reshape(ref.shape), np.asarray(ref),
        rtol=2e-4, atol=2e-5,
    )


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
