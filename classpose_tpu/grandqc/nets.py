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
    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skips: list):
        B, H, W, C = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # nearest ×2
        if skips:
            x = jnp.concatenate([x] + skips, axis=-1)
        x = ConvSame(self.out_ch, 3, use_bias=False, dtype=self.dtype,
                     name="conv1_0")(x)
        x = BatchNorm(name="conv1_1")(x)
        x = nn.relu(x)
        x = ConvSame(self.out_ch, 3, use_bias=False, dtype=self.dtype,
                     name="conv2_0")(x)
        x = BatchNorm(name="conv2_1")(x)
        return nn.relu(x)


@dataclasses.dataclass(frozen=True)
class UnetPlusPlusConfig:
    classes: int = 2
    row_channels: tuple = (32, 64, 128, 256)  # per resolution row 0..3
    final_channels: int = 16
    dtype: str = "float32"


class UnetPlusPlus(nn.Module):
    """UNet++ (Zhou et al.) decoder over the EfficientNet-B0 pyramid.

    Node grid X[i][j]: row i = resolution level (0 = /2 … 4 = /32 encoder
    head), column j = dense-skip depth. X[i][j] consumes all X[i][k<j] plus
    the upsampled X[i+1][j−1]; the output row X[0][4] is upsampled once
    more to full resolution before the 3×3 segmentation head — the same
    computation pattern and capacity class as smp's UnetPlusPlus used by
    GrandQC (decoder channel ladder 256/128/64/32 → 16).
    """

    cfg: UnetPlusPlusConfig

    @nn.compact
    def __call__(self, x_nchw):
        dt = jnp.dtype(self.cfg.dtype)
        x = jnp.transpose(x_nchw, (0, 2, 3, 1)).astype(dt)
        feats = EfficientNetB0Encoder(dtype=dt, name="encoder")(x)
        enc = feats[1:]  # rows 0..4: /2(32), /4(24), /8(40), /16(112), /32(320)
        rows = len(enc)  # 5
        ch = self.cfg.row_channels

        X: dict[tuple[int, int], jnp.ndarray] = {
            (i, 0): enc[i] for i in range(rows)
        }
        for j in range(1, rows):
            for i in range(rows - j):
                below = X[(i + 1, j - 1)]
                skips = [X[(i, k)] for k in range(j)]
                X[(i, j)] = DecoderBlock(
                    ch[min(i, len(ch) - 1)], dtype=dt, name=f"x_{i}_{j}"
                )(below, skips)

        out = DecoderBlock(
            self.cfg.final_channels, dtype=dt, name="final_up"
        )(X[(0, rows - 1)], [])
        logits = nn.Conv(
            self.cfg.classes, (3, 3), padding=1, dtype=dt,
            name="segmentation_head",
        )(out)
        return jnp.transpose(logits, (0, 3, 1, 2)).astype(jnp.float32)
