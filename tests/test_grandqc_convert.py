"""GrandQC converter structural test: a synthetic timm-named efficientnet-b0
state dict must convert into exactly the encoder tree the flax net expects
(same structure, same shapes)."""

import numpy as np
import jax
import pytest

from classpose_tpu.grandqc.convert import (
    _B0_BLOCKS,
    convert_efficientnet_b0_encoder,
    convert_grandqc_checkpoint,
)
from classpose_tpu.grandqc.nets import EfficientNetB0Encoder, _B0_STAGES


def synthetic_timm_sd(prefix="encoder."):
    """Build a timm-named efficientnet-b0 state dict with correct shapes."""
    rng = np.random.default_rng(0)
    sd = {}

    def conv(key, cout, cin, k, bias=False, groups=1):
        sd[f"{key}.weight"] = rng.normal(
            size=(cout, cin // groups, k, k)
        ).astype(np.float32)
        if bias:
            sd[f"{key}.bias"] = np.zeros(cout, np.float32)

    def bn(key, c):
        sd[f"{key}.weight"] = np.ones(c, np.float32)
        sd[f"{key}.bias"] = np.zeros(c, np.float32)
        sd[f"{key}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{key}.running_var"] = np.ones(c, np.float32)

    conv(f"{prefix}conv_stem", 32, 3, 3)
    bn(f"{prefix}bn1", 32)
    cin = 32
    for s, (cout, k, stride, expand, n) in enumerate(_B0_STAGES):
        for i in range(n):
            t = f"{prefix}blocks.{s}.{i}"
            c_in_blk = cin if i == 0 else cout
            if expand != 1:
                mid = c_in_blk * expand
                conv(f"{t}.conv_pw", mid, c_in_blk, 1)
                bn(f"{t}.bn1", mid)
                conv(f"{t}.conv_dw", mid, mid, k, groups=mid)
                bn(f"{t}.bn2", mid)
                conv(f"{t}.conv_pwl", cout, mid, 1)
                bn(f"{t}.bn3", cout)
            else:
                mid = c_in_blk
                conv(f"{t}.conv_dw", mid, mid, k, groups=mid)
                bn(f"{t}.bn1", mid)
                conv(f"{t}.conv_pw", cout, mid, 1)
                bn(f"{t}.bn2", cout)
            se_red = max(1, int(c_in_blk * 0.25))
            conv(f"{t}.se.conv_reduce", se_red, mid, 1, bias=True)
            conv(f"{t}.se.conv_expand", mid, se_red, 1, bias=True)
        cin = cout
    return sd


def test_encoder_conversion_matches_flax_tree():
    sd = synthetic_timm_sd()
    converted = convert_efficientnet_b0_encoder(sd)

    enc = EfficientNetB0Encoder()
    ref = enc.init(
        jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32)
    )["params"]

    ref_flat = {
        "/".join(str(k.key) for k in path): leaf.shape
        for path, leaf in jax.tree_util.tree_flatten_with_path(ref)[0]
    }
    conv_flat = {
        "/".join(str(k.key) for k in path): np.asarray(leaf).shape
        for path, leaf in jax.tree_util.tree_flatten_with_path(converted)[0]
    }
    assert set(ref_flat) == set(conv_flat), (
        set(ref_flat) ^ set(conv_flat)
    )
    for k in ref_flat:
        assert ref_flat[k] == conv_flat[k], (k, ref_flat[k], conv_flat[k])

    # converted weights must actually run
    out = enc.apply(
        {"params": converted}, np.zeros((1, 64, 64, 3), np.float32)
    )
    assert out[-1].shape[-1] == 320


def test_full_checkpoint_graft():
    sd = synthetic_timm_sd()
    params, frac = convert_grandqc_checkpoint(sd, classes=2)
    assert 0.3 < frac < 1.0
    from classpose_tpu.grandqc.nets import UnetPlusPlus, UnetPlusPlusConfig

    net = UnetPlusPlus(UnetPlusPlusConfig(classes=2))
    y = net.apply(params, np.zeros((1, 3, 64, 64), np.float32))
    assert y.shape == (1, 2, 64, 64)


def test_incomplete_decoder_rejected():
    """decoder.* keys without the full smp layout must error loudly, not
    silently graft a partial decoder."""
    sd = synthetic_timm_sd()
    sd["decoder.blocks.x_0_0.conv1.0.weight"] = np.zeros(
        (16, 16, 3, 3), np.float32
    )
    with pytest.raises(ValueError, match="decoder"):
        convert_grandqc_checkpoint(sd, classes=2, strict=True)


def synthetic_smp_sd(classes=2):
    """Full smp UnetPlusPlus(timm-efficientnet-b0) state dict (random
    weights, non-trivial BN stats), built from the torch replica."""
    import torch

    from tests.torch_ref import RefSmpUnetPlusPlusTail, randomize_bn_stats

    torch.manual_seed(0)
    tail = RefSmpUnetPlusPlusTail(classes=classes)
    randomize_bn_stats(tail, seed=1)
    sd = {k: v.numpy() for k, v in tail.state_dict().items()}
    sd.update(synthetic_timm_sd())
    return sd, tail


def test_full_smp_graft_consumes_every_key():
    """Every tensor of a full smp checkpoint must graft (VERDICT r1
    item 3): converted fraction 1.0, strict mode clean, and an alien key
    makes strict mode raise."""
    sd, _ = synthetic_smp_sd()
    params, frac = convert_grandqc_checkpoint(sd, classes=2, strict=True)
    assert frac == 1.0
    from classpose_tpu.grandqc.nets import UnetPlusPlus, UnetPlusPlusConfig

    net = UnetPlusPlus(UnetPlusPlusConfig(classes=2))
    y = net.apply(params, np.zeros((1, 3, 64, 64), np.float32))
    assert y.shape == (1, 2, 64, 64)
    assert np.isfinite(np.asarray(y)).all()

    sd["decoder.blocks.x_9_9.conv1.0.weight"] = np.zeros(
        (1, 1, 3, 3), np.float32
    )
    with pytest.raises(ValueError, match="unconsumed"):
        convert_grandqc_checkpoint(sd, classes=2, strict=True)


def test_decoder_forward_parity_vs_torch_smp_replica():
    """fp32 logit parity of the flax UNet++ decoder+head vs the torch
    replica of smp's decoder math on a random feature pyramid."""
    import torch

    from classpose_tpu.grandqc.convert import convert_unetpp_decoder
    from classpose_tpu.grandqc.nets import (
        UnetPlusPlusConfig,
        UnetPlusPlusDecoder,
    )
    from classpose_tpu.nn.convert import _conv_t2f
    from tests.torch_ref import RefSmpUnetPlusPlusTail, randomize_bn_stats

    torch.manual_seed(3)
    tail = RefSmpUnetPlusPlusTail(classes=5)
    randomize_bn_stats(tail, seed=4)
    tail.eval()

    rng = np.random.default_rng(0)
    shapes = [(3, 64, 64), (32, 32, 32), (24, 16, 16), (40, 8, 8),
              (112, 4, 4), (320, 2, 2)]
    feats_nchw = [
        rng.normal(size=(1,) + s).astype(np.float32) for s in shapes
    ]
    with torch.no_grad():
        ref = tail([torch.from_numpy(f) for f in feats_nchw]).numpy()

    sd = {k: v.numpy() for k, v in tail.state_dict().items()}
    dec_params = convert_unetpp_decoder(sd)
    cfg = UnetPlusPlusConfig(classes=5)
    dec = UnetPlusPlusDecoder(cfg)
    feats_nhwc = [np.transpose(f, (0, 2, 3, 1)) for f in feats_nchw]
    out = dec.apply({"params": dec_params}, feats_nhwc)
    # head: 3x3 conv in numpy via jax for the final comparison
    import jax.numpy as jnp
    from flax import linen as nn

    head = nn.Conv(5, (3, 3), padding=1, name="segmentation_head")
    hp = {
        "kernel": _conv_t2f(sd["segmentation_head.0.weight"]),
        "bias": sd["segmentation_head.0.bias"],
    }
    logits = head.apply({"params": hp}, out)
    got = np.transpose(np.asarray(logits), (0, 3, 1, 2))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)
