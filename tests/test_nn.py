"""Network contract tests: output shapes/channel layout of ClassTransformer
and the class-head UNet (tiny configs — fast on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from classpose_tpu.nn import ClassTransformer, ClassTransformerConfig, UNet
from classpose_tpu.nn.vit_sam import pixel_shuffle

TINY = dict(embed_dim=64, depth=2, num_heads=4, neck_dim=32, bsize=64)


def test_pixel_shuffle_matches_identity_conv_transpose():
    """pixel_shuffle must equal conv_transpose with the frozen identity W3
    (reference vit_sam.py:139-144,182-190)."""
    ps, C, H = 4, 3, 5
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, H, H, C * ps * ps)).astype(np.float32)
    out = pixel_shuffle(jnp.asarray(x), ps, C)
    # direct construction of what conv_transpose with eye kernel produces
    expect = np.zeros((2, H * ps, H * ps, C), np.float32)
    for c in range(C):
        for dy in range(ps):
            for dx in range(ps):
                k = c * ps * ps + dy * ps + dx
                expect[:, dy::ps, dx::ps, c] = x[..., k]
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-6)


@pytest.mark.parametrize("n_classes,extra", [(1, 0), (5, 5)])
def test_class_transformer_shapes(n_classes, extra):
    cfg = ClassTransformerConfig(n_cell_classes=n_classes, **TINY)
    net = ClassTransformer(cfg)
    x = jnp.zeros((2, 3, cfg.bsize, cfg.bsize))
    params = net.init(jax.random.PRNGKey(0), x)
    out, style = net.apply(params, x)
    assert out.shape == (2, 3 + extra, cfg.bsize, cfg.bsize)
    assert style.shape == (2, 256)


def test_class_transformer_unet_head():
    cfg = ClassTransformerConfig(
        n_cell_classes=3, feature_transformation_structure=(8, 16), **TINY
    )
    net = ClassTransformer(cfg)
    x = jnp.zeros((1, 3, cfg.bsize, cfg.bsize))
    params = net.init(jax.random.PRNGKey(0), x)
    out, _ = net.apply(params, x)
    assert out.shape == (1, 6, cfg.bsize, cfg.bsize)


def test_class_transformer_rdrop_train_path():
    cfg = ClassTransformerConfig(n_cell_classes=2, rdrop=0.4, **TINY)
    net = ClassTransformer(cfg)
    x = jnp.ones((2, 3, cfg.bsize, cfg.bsize))
    params = net.init(jax.random.PRNGKey(0), x)
    out, _ = net.apply(
        params, x, train=True, rdrop_rng=jax.random.PRNGKey(1)
    )
    assert np.isfinite(np.asarray(out)).all()


def test_unet_shapes():
    net = UNet(out_channels=7, n_channels=(8, 16))
    x = jnp.zeros((1, 32, 32, 4))
    params = net.init(jax.random.PRNGKey(0), x)
    y = net.apply(params, x)
    assert y.shape == (1, 32, 32, 7)
