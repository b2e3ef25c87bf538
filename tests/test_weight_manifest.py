"""Weight-key manifest of a real cpsam/classpose checkpoint.

The numeric-parity chain is anchored to the in-repo torch replica
(nn/torch_replica.py); this test pins the replica — and the converter —
to the EXPECTED state-dict key/shape manifest of a real published
checkpoint, transcribed by hand from reference source:

- ClassTransformer head keys: /root/reference/src/classpose/vit_sam.py
  :129-144 (out_class conv-or-UNet + frozen W3 identity), cellpose ``out``
  + ``W2`` + ``diam_mean``/``diam_labels`` per the cellpose Transformer
  contract (SURVEY §2.4; reference train.py:440 writes net.diam_labels).
- SAM ViT-L encoder keys: patch_embed.proj, pos_embed, 24 blocks of
  {norm1, attn.{qkv,proj,rel_pos_h,rel_pos_w}, norm2, mlp.{lin1,lin2}},
  4-stage neck — the decomposed-rel-pos windowless geometry the
  reference's flash_forward patch assumes (vit_sam.py:15-65).

If a real checkpoint ever carries a key this manifest misses (or the
converter fails to consume), ``convert_state_dict`` now raises instead
of silently loading an incomplete network.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from classpose_tpu.nn.convert import convert_state_dict  # noqa: E402
from classpose_tpu.nn.manifest import (  # noqa: E402
    manifest_diff,
    vit_l_manifest,
)
from classpose_tpu.nn.torch_replica import RefClassTransformer  # noqa: E402


def test_replica_state_dict_matches_manifest():
    """The torch replica's state dict must equal the hand-transcribed
    real-checkpoint manifest — keys AND shapes, no extras, no gaps."""
    net = RefClassTransformer(n_cell_classes=6)
    sd = {k: tuple(v.shape) for k, v in net.state_dict().items()}
    manifest = vit_l_manifest(6)
    missing = sorted(set(manifest) - set(sd))
    extra = sorted(set(sd) - set(manifest))
    assert not missing, f"replica lacks real-checkpoint keys: {missing[:8]}"
    assert not extra, f"replica has keys no real checkpoint has: {extra[:8]}"
    for k, shape in manifest.items():
        assert sd[k] == shape, f"{k}: replica {sd[k]} != manifest {shape}"


def test_cpsam_manifest_single_class():
    net = RefClassTransformer(n_cell_classes=1)
    sd = {k: tuple(v.shape) for k, v in net.state_dict().items()}
    assert sd == vit_l_manifest(1)


def _tiny_sd(n_cell_classes=3, structure=None):
    net = RefClassTransformer(
        ps=4, bsize=32, n_cell_classes=n_cell_classes,
        structure=structure, embed_dim=32, depth=2, num_heads=2,
        neck_dim=16,
    )
    return {k: v.detach().numpy() for k, v in net.state_dict().items()}


def test_converter_consumes_every_manifest_key():
    """convert_state_dict must consume the full manifest (modulo the
    documented non-parameter buffers) — and fail LOUDLY on a key it
    doesn't know (strict_consume)."""
    sd = _tiny_sd()
    convert_state_dict(sd)  # must not raise

    sd_extra = dict(sd)
    sd_extra["encoder.blocks.0.attn.novel_buffer"] = np.zeros(3, np.float32)
    with pytest.raises(ValueError, match="did not map"):
        convert_state_dict(sd_extra)
    # non-strict still converts, with a warning
    convert_state_dict(sd_extra, strict_consume=False)


def test_converter_consumes_unet_head_variant():
    sd = _tiny_sd(structure=[16, 32])
    convert_state_dict(sd)
    sd_extra = dict(sd)
    sd_extra["out_class.bottleneck_up.stray.weight"] = np.zeros(
        2, np.float32
    )
    with pytest.raises(ValueError, match="did not map"):
        convert_state_dict(sd_extra)


def test_full_size_manifest_converts_and_consumes():
    """Build a state dict with the EXACT manifest keys/shapes (zeros +
    identity readouts) — the converter must map all of it without
    touching the replica at full size."""
    manifest = vit_l_manifest(6)
    sd = {}
    for k, shape in manifest.items():
        if k == "W2":
            sd[k] = np.eye(192, dtype=np.float32).reshape(192, 3, 8, 8)
        elif k == "W3":
            sd[k] = np.eye(384, dtype=np.float32).reshape(384, 6, 8, 8)
        else:
            sd[k] = np.zeros(shape, np.float32)
    params = convert_state_dict(sd)["params"]
    assert params["encoder"]["patch_embed"]["kernel"].shape == (8, 8, 3, 1024)
    assert "blocks_23" in params["encoder"]
    assert params["out_class"]["kernel"].shape == (1, 1, 256, 384)


def test_manifest_diff_clean_and_dirty():
    """manifest_diff (what parity_check reports for a real checkpoint):
    the replica state dict diffs clean; a perturbed one reports every
    category."""
    net = RefClassTransformer(n_cell_classes=6)
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    d = manifest_diff(sd, vit_l_manifest(6))
    assert d["match"], d

    sd_bad = dict(sd)
    sd_bad.pop("out.bias")
    sd_bad["stray.weight"] = np.zeros(3, np.float32)
    sd_bad["out.weight"] = np.zeros((1, 2, 3), np.float32)
    d = manifest_diff(sd_bad, vit_l_manifest(6))
    assert d["missing"] == ["out.bias"]
    assert d["unexpected"] == ["stray.weight"]
    assert d["shape_mismatch"][0]["key"] == "out.weight"
    assert not d["match"]
