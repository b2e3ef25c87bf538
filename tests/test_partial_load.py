"""Partial head loading + trainable-only save (reference vit_sam.py:251-285
API parity)."""

import numpy as np
import jax
import pytest

from classpose_tpu.nn import ClassTransformer, ClassTransformerConfig
from classpose_tpu.nn.convert import (
    load_classification_head,
    load_npz_checkpoint,
    save_params,
    save_trainable_params,
)

CFG = ClassTransformerConfig(
    n_cell_classes=3, embed_dim=32, depth=1, num_heads=2, neck_dim=16,
    bsize=64,
)


def _params(seed):
    net = ClassTransformer(CFG)
    return net.init(jax.random.PRNGKey(seed),
                    np.zeros((1, 3, 64, 64), np.float32))


def test_load_classification_head(tmp_path):
    donor = _params(1)
    target = _params(0)
    ckpt = tmp_path / "donor.npz"
    save_params(donor, str(ckpt), CFG)
    merged = load_classification_head(target, str(ckpt))
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["out"]["kernel"]),
        np.asarray(donor["params"]["out"]["kernel"]),
    )
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["out_class"]["kernel"]),
        np.asarray(donor["params"]["out_class"]["kernel"]),
    )
    # encoder untouched
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["encoder"]["pos_embed"]),
        np.asarray(target["params"]["encoder"]["pos_embed"]),
    )


def test_save_trainable_only(tmp_path):
    from classpose_tpu.train.train import _freeze_label_tree

    params = _params(0)
    labels = _freeze_label_tree(params["params"], freeze_backbone=True)
    ckpt = tmp_path / "trainable.npz"
    save_trainable_params(
        params, str(ckpt), freeze_labels={"params": labels}, cfg=CFG
    )
    loaded, meta = load_npz_checkpoint(str(ckpt))
    assert meta is not None
    enc = loaded["params"].get("encoder", {})
    # backbone frozen → dropped; the neck is NOT part of "backbone"
    # (reference freeze semantics, vit_sam.py:199-249) → kept
    assert "blocks_0" not in enc and "pos_embed" not in enc
    assert "neck_conv1" in enc
    assert "out" in loaded["params"] and "out_class" in loaded["params"]
