"""GrandQC Zenodo checkpoint key/shape manifest (VERDICT r4 item 8).

Mirrors tests/test_weight_manifest.py for the GrandQC converter: the
hand-transcribed smp ``UnetPlusPlus(timm-efficientnet-b0)`` manifest
(classpose_tpu/nn/manifest.py, transcribed from timm efficientnet-b0 +
smp UnetPlusPlusDecoder layouts — reference builds the net at
grandqc/wsi_tissue_detection.py:86-95) must be FULLY consumed by
``convert_grandqc_checkpoint`` in strict mode, graft 100% of the flax
tree, agree with the in-repo torch replica of the smp decoder tail, and
fail loudly on unknown keys.
"""

import numpy as np
import pytest

from classpose_tpu.grandqc.convert import convert_grandqc_checkpoint
from classpose_tpu.nn.manifest import grandqc_manifest, manifest_diff


def manifest_sd(classes: int, seed: int = 0) -> dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    sd = {}
    for k, shape in grandqc_manifest(classes).items():
        if k.endswith("num_batches_tracked"):
            sd[k] = np.asarray(0, np.int64)
        elif k.endswith("running_var"):
            sd[k] = rng.uniform(0.5, 2.0, shape).astype(np.float32)
        else:
            sd[k] = rng.normal(0, 0.05, shape).astype(np.float32)
    return sd


@pytest.mark.parametrize("classes", [2, 8])
def test_strict_conversion_consumes_full_manifest(classes):
    sd = manifest_sd(classes)
    params, frac = convert_grandqc_checkpoint(sd, classes, strict=True)
    assert frac == 1.0
    head = params["params"]["segmentation_head"]
    assert head["kernel"].shape == (3, 3, 16, classes)


def test_unknown_key_fails_loudly():
    sd = manifest_sd(2)
    sd["decoder.blocks.x_0_0.attention1.weight"] = np.zeros(3, np.float32)
    with pytest.raises(ValueError, match="unconsumed"):
        convert_grandqc_checkpoint(sd, 2, strict=True)


def test_missing_decoder_key_fails_loudly():
    sd = manifest_sd(2)
    del sd["decoder.blocks.x_1_2.conv2.0.weight"]
    with pytest.raises(ValueError, match="decoder"):
        convert_grandqc_checkpoint(sd, 2, strict=True)


def test_manifest_diff_clean_and_dirty():
    sd = manifest_sd(2)
    d = manifest_diff(sd, grandqc_manifest(2))
    assert d["match"], d
    sd.pop("encoder.conv_stem.weight")
    sd["encoder.bn_extra.weight"] = np.zeros(3, np.float32)
    d = manifest_diff(sd, grandqc_manifest(2))
    assert d["missing"] == ["encoder.conv_stem.weight"]
    assert d["unexpected"] == ["encoder.bn_extra.weight"]
    assert not d["match"]


def test_manifest_matches_torch_replica_tail():
    """The decoder/head section of the manifest must equal the state
    dict of the in-repo torch replica of smp's UNet++ tail — two
    independent transcriptions of the same published layout."""
    torch = pytest.importorskip("torch")
    from tests.torch_ref import RefSmpUnetPlusPlusTail

    tail = RefSmpUnetPlusPlusTail(classes=2)
    sd = {k: tuple(v.shape) for k, v in tail.state_dict().items()}
    man = {
        k: shape for k, shape in grandqc_manifest(
            2, bn_counters=True
        ).items()
        if k.startswith(("decoder.", "segmentation_head."))
    }
    # replica may or may not register BN counters; compare the parameter
    # subset it carries
    missing = sorted(set(man) - set(sd))
    missing = [k for k in missing if not k.endswith("num_batches_tracked")]
    extra = sorted(set(sd) - set(man))
    assert not missing, f"replica lacks manifest keys: {missing[:8]}"
    assert not extra, f"replica keys missing from manifest: {extra[:8]}"
    for k, shape in sd.items():
        assert tuple(man[k]) == shape, (k, man[k], shape)


def test_manifest_matches_flax_tree_shapes():
    """Every manifest tensor must land in the flax tree with a
    transposed-equivalent shape — conversion at full size, both class
    counts, without any torch dependency."""
    for classes in (2, 8):
        sd = manifest_sd(classes, seed=classes)
        params, frac = convert_grandqc_checkpoint(sd, classes, strict=True)
        assert frac == 1.0
        import jax

        n_leaves = len(jax.tree_util.tree_leaves(params))
        # conv kernels + bn (4 each) + se/head biases all grafted
        n_manifest_tensors = sum(
            1 for k in grandqc_manifest(classes, bn_counters=False)
        )
        assert n_leaves == n_manifest_tensors
