"""Pallas LayerNorm kernel vs the XLA reference math (interpret mode on
CPU), and FastLayerNorm's drop-in compatibility with nn.LayerNorm."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.parametrize("shape", [(2, 7, 32, 32, 1024), (25, 64, 64, 256),
                                   (8, 128)])
@pytest.mark.parametrize("fast_var", [True, False])
def test_kernel_matches_reference(shape, fast_var):
    from classpose_tpu.nn.layernorm import (
        layernorm_pallas,
        layernorm_ref,
        layernorm_supported,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=shape).astype(np.float32) * 3 + 0.5, jnp.bfloat16
    )
    C = shape[-1]
    scale = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
    assert layernorm_supported(x)

    ref = np.asarray(
        layernorm_ref(x, scale, bias, fast_var=fast_var).astype(jnp.float32)
    )
    pal = np.asarray(
        layernorm_pallas(
            x, scale, bias, fast_var=fast_var, interpret=True
        ).astype(jnp.float32)
    )
    # identical math, f32 reduction-order differences land below bf16 ULP
    # almost everywhere; allow one bf16 ULP on the normalized scale
    np.testing.assert_allclose(pal, ref, atol=0.06, rtol=0.02)
    assert (pal == ref).mean() > 0.98


def test_kernel_under_vmap():
    from classpose_tpu.nn.layernorm import layernorm_pallas, layernorm_ref

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3, 16, 256)).astype(np.float32),
                    jnp.bfloat16)
    scale = jnp.ones((256,), jnp.float32)
    bias = jnp.zeros((256,), jnp.float32)
    ref = jax.vmap(lambda t: layernorm_ref(t, scale, bias))(x)
    pal = jax.vmap(
        lambda t: layernorm_pallas(t, scale, bias, interpret=True)
    )(x)
    np.testing.assert_allclose(
        np.asarray(pal.astype(jnp.float32)),
        np.asarray(ref.astype(jnp.float32)),
        atol=0.06, rtol=0.02,
    )


def test_fast_layernorm_matches_flax_fp32():
    """fp32 path (Pallas gated off): FastLayerNorm must reproduce
    nn.LayerNorm bit-for-bit — the fp32 torch-parity contract depends on
    it."""
    import flax.linen as nn

    from classpose_tpu.nn.layernorm import FastLayerNorm

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 10, 512)).astype(np.float32))

    ours = FastLayerNorm(epsilon=1e-6, dtype=jnp.float32)
    theirs = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)
    p1 = ours.init(jax.random.PRNGKey(0), x)
    p2 = theirs.init(jax.random.PRNGKey(0), x)
    # same param tree (names and shapes) — checkpoints graft unchanged
    assert jax.tree_util.tree_structure(p1) == jax.tree_util.tree_structure(
        p2
    )
    # randomize the affine params identically
    p = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            rng.normal(size=a.shape).astype(np.float32)
        ),
        p1,
    )
    y1 = np.asarray(ours.apply(p, x))
    y2 = np.asarray(theirs.apply(p, x))
    np.testing.assert_allclose(y1, y2, atol=1e-6, rtol=1e-6)
