"""UNet++ with a TF-padding EfficientNet-B0 encoder, in flax.

Reimplements the nets GrandQC builds from segmentation_models_pytorch
(reference grandqc/wsi_tissue_detection.py:86-95 — ``smp.UnetPlusPlus``
with the ``timm-efficientnet-b0`` encoder): the 2-class tissue model and
the 7/8-class artefact model share this architecture.

Encoder (timm tf_efficientnet_b0 layout, TF "SAME" padding):
  stem conv 3→32 s2 + BN + SiLU, then 7 MBConv stages
  (channels 16/24/40/80/112/192/320, strides 1/2/2/2/1/2/1, expand
  1/6/6/6/6/6/6, kernels 3/3/5/3/5/5/3, SE ratio 0.25 of block input);
  skip features at reductions 2/4/8/16/32 →
  out_channels (3, 32, 24, 40, 112, 320) — smp's documented layout.

Decoder (smp UNet++): nested dense blocks x_{depth}_{layer}; every block is
upsample×2 → concat skips → (conv3x3+BN+ReLU)×2 with decoder_channels
(256, 128, 64, 32, 16); segmentation head = conv3x3 to n_classes.

Inference-only: BatchNorm uses stored running statistics.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _same_pad(x, kernel: int, stride: int):
    """TF 'SAME' asymmetric padding (timm Conv2dSame behavior)."""
    H, W = x.shape[1], x.shape[2]
    def pad_amt(size):
        out = -(-size // stride)
        total = max(0, (out - 1) * stride + kernel - size)
        return total // 2, total - total // 2
    ph = pad_amt(H)
    pw = pad_amt(W)
    return jnp.pad(x, ((0, 0), ph, pw, (0, 0)))


class ConvSame(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    groups: int = 1
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _same_pad(x, self.kernel, self.stride)
        return nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride), padding="VALID",
            feature_group_count=self.groups, use_bias=self.use_bias,
            dtype=self.dtype, name="conv",
        )(x)


class BatchNorm(nn.Module):
    """Inference BatchNorm with stored statistics as params."""

    epsilon: float = 1e-3  # timm efficientnet default (TF)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (c,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (c,), jnp.float32)
        inv = jnp.asarray(scale) / jnp.sqrt(jnp.asarray(var) + self.epsilon)
        return (x - mean) * inv + bias


class SqueezeExcite(nn.Module):
    reduced: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = x.mean(axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced, (1, 1), dtype=self.dtype,
                    name="conv_reduce")(s)
        s = nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype,
                    name="conv_expand")(s)
        return x * nn.sigmoid(s)


class MBConv(nn.Module):
    out_ch: int
    kernel: int
    stride: int
    expand: int
    se_ratio: float = 0.25
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        shortcut = x
        h = x
        if self.expand != 1:
            h = ConvSame(in_ch * self.expand, 1, dtype=self.dtype,
                         name="conv_pw")(h)
            h = BatchNorm(name="bn1")(h)
            h = nn.silu(h)
        h = ConvSame(
            h.shape[-1], self.kernel, self.stride, groups=h.shape[-1],
            dtype=self.dtype, name="conv_dw",
        )(h)
        h = BatchNorm(name="bn2" if self.expand != 1 else "bn1")(h)
        h = nn.silu(h)
        if self.se_ratio > 0:
            h = SqueezeExcite(
                max(1, int(in_ch * self.se_ratio)), dtype=self.dtype,
                name="se",
            )(h)
        if self.expand != 1:
            h = ConvSame(self.out_ch, 1, dtype=self.dtype, name="conv_pwl")(h)
            h = BatchNorm(name="bn3")(h)
        else:  # depthwise-separable block (stage 0)
            h = ConvSame(self.out_ch, 1, dtype=self.dtype, name="conv_pw")(h)
            h = BatchNorm(name="bn2")(h)
        if self.stride == 1 and in_ch == self.out_ch:
            h = h + shortcut
        return h


# (out_ch, kernel, stride, expand, n_blocks) — efficientnet-b0
_B0_STAGES = [
    (16, 3, 1, 1, 1),
    (24, 3, 2, 6, 2),
    (40, 5, 2, 6, 2),
    (80, 3, 2, 6, 3),
    (112, 5, 1, 6, 3),
    (192, 5, 2, 6, 4),
    (320, 3, 1, 6, 1),
]

B0_OUT_CHANNELS = (3, 32, 24, 40, 112, 320)  # smp encoder out_channels


class EfficientNetB0Encoder(nn.Module):
    """Returns the smp 6-feature pyramid [x, r2, r4, r8, r16, r32]."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = [x]
        h = ConvSame(32, 3, 2, dtype=self.dtype, name="conv_stem")(x)
        h = BatchNorm(name="bn1")(h)
        h = nn.silu(h)
        feats.append(h)  # reduction 2, 32ch
        reduction_feats = {4: None, 8: None, 16: None, 32: None}
        red = 2
        for s, (out_ch, k, stride, expand, n) in enumerate(_B0_STAGES):
            for i in range(n):
                st = stride if i == 0 else 1
                if st == 2 and red in reduction_feats and \
                        reduction_feats[red] is None:
                    reduction_feats[red] = h
                h = MBConv(
                    out_ch, k, st, expand, dtype=self.dtype,
                    name=f"blocks_{s}_{i}",
                )(h)
                red = red * st
        feats.append(reduction_feats[4])   # 24 ch @ /4
        feats.append(reduction_feats[8])   # 40 ch @ /8
        feats.append(reduction_feats[16])  # 112 ch @ /16
        feats.append(h)                    # 320 ch @ /32
        return feats


class DecoderBlock(nn.Module):
    """smp DecoderBlock (attention=None): nearest ×2 upsample → concat
    [x, skip] → Conv2dReLU ×2. Concatenation order is the smp one — the
    upsampled input first, then the skip stack — because it fixes the
    input-channel order the pretrained conv1 kernels expect."""

    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skips: list):
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # nearest ×2
        if skips:
            x = jnp.concatenate([x] + skips, axis=-1)
        # smp Conv2dReLU: conv3x3 (no bias) + BatchNorm2d (torch default
        # eps 1e-5, unlike the encoder's TF 1e-3) + ReLU
        x = ConvSame(self.out_ch, 3, use_bias=False, dtype=self.dtype,
                     name="conv1_0")(x)
        x = BatchNorm(epsilon=1e-5, name="conv1_1")(x)
        x = nn.relu(x)
        x = ConvSame(self.out_ch, 3, use_bias=False, dtype=self.dtype,
                     name="conv2_0")(x)
        x = BatchNorm(epsilon=1e-5, name="conv2_1")(x)
        return nn.relu(x)


@dataclasses.dataclass(frozen=True)
class UnetPlusPlusConfig:
    classes: int = 2
    decoder_channels: tuple = (256, 128, 64, 32, 16)  # smp default
    dtype: str = "float32"


class UnetPlusPlusDecoder(nn.Module):
    """smp-exact UNet++ decoder graph over the 6-feature encoder pyramid.

    Replicates smp UnetPlusPlusDecoder's block wiring and parameter layout
    (``decoder.blocks.x_{depth}_{layer}``, attention=None) so the published
    GrandQC Zenodo checkpoints graft 1:1 (reference builds
    ``smp.UnetPlusPlus(timm-efficientnet-b0)``,
    grandqc/wsi_tissue_detection.py:86-95). The wiring is pinned by smp's
    per-block channel spec — for features reversed to
    [head, f1, f2, f3, f4] with head at the deepest reduction:

      in_channels   = [head] + decoder_channels[:-1]
      skip_channels = [ch(f1), ch(f2), ch(f3), ch(f4), 0]
      block x_{d}_{L}: input  = features[d]        if d == L (diagonal)
                              = x_{d}_{L-1}         otherwise
                       skips  = [x_{i}_{L} for i in d+1..L] + [features[L+1]]
                       out_ch = decoder_channels[L] if d == 0
                              = skip_channels[L]    otherwise
      output = x_0_depth(x_0_{depth-1}), no skip — full resolution.
    """

    cfg: UnetPlusPlusConfig

    @nn.compact
    def __call__(self, feats: list):
        dt = jnp.dtype(self.cfg.dtype)
        dec = self.cfg.decoder_channels
        features = feats[1:][::-1]  # drop full-res input, head first
        depth = len(dec) - 1
        skip_channels = [f.shape[-1] for f in features[1:]] + [0]

        dense: dict[tuple[int, int], jnp.ndarray] = {}
        for layer in range(depth):
            for d in range(depth - layer):
                L = d + layer
                out_ch = int(dec[L]) if d == 0 else int(skip_channels[L])
                if layer == 0:  # diagonal: encoder feature in, next as skip
                    x_in, skips = features[d], [features[d + 1]]
                else:
                    x_in = dense[(d, L - 1)]
                    skips = [dense[(i, L)] for i in range(d + 1, L + 1)]
                    skips.append(features[L + 1])
                dense[(d, L)] = DecoderBlock(
                    out_ch, dtype=dt, name=f"x_{d}_{L}"
                )(x_in, skips)
        return DecoderBlock(
            int(dec[depth]), dtype=dt, name=f"x_0_{depth}"
        )(dense[(0, depth - 1)], [])


class UnetPlusPlus(nn.Module):
    """smp UnetPlusPlus(timm-efficientnet-b0): encoder pyramid →
    smp-exact UNet++ decoder → 3×3 segmentation head."""

    cfg: UnetPlusPlusConfig

    @nn.compact
    def __call__(self, x_nchw):
        dt = jnp.dtype(self.cfg.dtype)
        x = jnp.transpose(x_nchw, (0, 2, 3, 1)).astype(dt)
        feats = EfficientNetB0Encoder(dtype=dt, name="encoder")(x)
        out = UnetPlusPlusDecoder(self.cfg, name="decoder")(feats)
        logits = nn.Conv(
            self.cfg.classes, (3, 3), padding=1, dtype=dt,
            name="segmentation_head",
        )(out)
        return jnp.transpose(logits, (0, 3, 1, 2)).astype(jnp.float32)
