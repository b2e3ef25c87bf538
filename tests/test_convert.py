"""Converter parity: random torch ClassTransformer weights → JAX must match
the torch forward at fp32."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from classpose_tpu.nn import ClassTransformer, ClassTransformerConfig
from classpose_tpu.nn.convert import (
    convert_state_dict,
    infer_structure,
    load_npz_params,
    save_params,
)
from tests.torch_ref import RefClassTransformer, RefUNet

TINY = dict(ps=4, bsize=32, embed_dim=32, depth=2, num_heads=2, neck_dim=16)


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            if p.requires_grad:
                p.copy_(torch.randn(p.shape, generator=g) * 0.2)
    return model


def _run_pair(n_classes, structure):
    tm = _randomize(
        RefClassTransformer(
            n_cell_classes=n_classes, structure=structure, **TINY
        )
    ).eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = convert_state_dict(sd)
    cfg = ClassTransformerConfig(
        ps=TINY["ps"],
        bsize=TINY["bsize"],
        embed_dim=TINY["embed_dim"],
        depth=TINY["depth"],
        num_heads=TINY["num_heads"],
        neck_dim=TINY["neck_dim"],
        n_cell_classes=n_classes,
        feature_transformation_structure=structure,
    )
    jnet = ClassTransformer(cfg)
    x = np.random.default_rng(0).normal(size=(2, 3, 32, 32)).astype(
        np.float32
    )
    with torch.no_grad():
        t_out = tm(torch.from_numpy(x)).numpy()
    j_out, _ = jnet.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_out), t_out, rtol=2e-4, atol=2e-4)


def test_parity_conv_head():
    _run_pair(5, None)


def test_parity_single_class():
    _run_pair(1, None)


def test_parity_unet_head():
    _run_pair(3, (8, 16))


def test_unet_convtranspose_parity():
    """Pin the ConvTranspose kernel mapping torch→flax."""
    from classpose_tpu.nn.unet import UNet

    tm = _randomize(RefUNet(4, 6, [8, 16])).eval()
    sd = {f"out_class.{k}": v.numpy() for k, v in tm.state_dict().items()}
    from classpose_tpu.nn.convert import _convert_unet

    params = {"params": _convert_unet(sd, "out_class.")}
    junet = UNet(out_channels=6, n_channels=(8, 16))
    x = np.random.default_rng(1).normal(size=(1, 16, 16, 4)).astype(
        np.float32
    )
    with torch.no_grad():
        t_out = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    j_out = junet.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(j_out).transpose(0, 3, 1, 2), t_out, rtol=2e-4, atol=2e-4
    )


def test_infer_structure_and_npz_roundtrip(tmp_path):
    tm = RefClassTransformer(n_cell_classes=4, structure=[8, 16], **TINY)
    pt = tmp_path / "model.pt"
    torch.save(tm.state_dict(), pt)
    structure, n_classes = infer_structure(str(pt))
    assert n_classes == 4
    assert structure == [8, 16]

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = convert_state_dict(sd)
    npz = tmp_path / "model.npz"
    save_params(params, str(npz))
    loaded = load_npz_params(str(npz))
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(loaded)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_non_identity_readout_rejected():
    tm = RefClassTransformer(n_cell_classes=2, **TINY)
    with torch.no_grad():
        tm.W3 += 0.5
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    with pytest.raises(ValueError, match="identity pixel-shuffle"):
        convert_state_dict(sd)
