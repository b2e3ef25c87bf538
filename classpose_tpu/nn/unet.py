"""Class-head UNet in flax.

Functional equivalent of the reference class-head UNet
(/root/reference/src/classpose/unet.py:4-196): an asymmetric UNet whose
encoder "skips" are the *downsampled* block outputs, with an extra
bottleneck down/up pair, decoder blocks that upsample at the end, and the
final decoder block skipping its last ReLU. Used as the optional
``out_class`` "feature transformation structure" over the 256-channel neck
features.

Layout note: this module is NHWC (TPU-native); the torch reference is NCHW.
The weight converter transposes kernels accordingly.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class UNetBlock(nn.Module):
    """conv3x3 → ReLU → conv3x3 (→ ReLU unless skipped)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip_last_activation: bool = False):
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(x)
        if not skip_last_activation:
            x = nn.relu(x)
        return x


class UNetBlockDown(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip_last_activation: bool = False):
        x = UNetBlock(self.out_channels, self.dtype, name="block")(
            x, skip_last_activation
        )
        x_down = nn.Conv(
            self.out_channels, (2, 2), strides=(2, 2), dtype=self.dtype,
            name="downconv",
        )(x)
        return x, x_down


class UNetBlockUp(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip_last_activation: bool = False):
        x = UNetBlock(self.out_channels, self.dtype, name="block")(
            x, skip_last_activation
        )
        x = nn.ConvTranspose(
            self.out_channels, (2, 2), strides=(2, 2), padding="VALID",
            dtype=self.dtype, name="upconv",
        )(x)
        return x


class UNet(nn.Module):
    """Asymmetric UNet matching reference unet.py:121-196 semantics.

    ``n_channels`` is the encoder channel ladder (default [64, 128, 256,
    512]); the decoder mirrors it in reverse and ends at ``out_channels``.
    """

    out_channels: int
    n_channels: Sequence[int] = (64, 128, 256, 512)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        chans = list(self.n_channels)
        enc_out = chans  # per-encoder output channels
        # decoder out-channels follow the (in, out) pairs of the reference's
        # out_channel_sequence = [*reversed(n_channels), out_channels]
        dec_out = chans[::-1][1:] + [self.out_channels]

        skips = []
        for i, c in enumerate(enc_out):
            _, x = UNetBlockDown(c, self.dtype, name=f"encoder_blocks_{i}")(x)
            skips.append(x)
        skips = skips[::-1]

        _, x = UNetBlockDown(enc_out[-1], self.dtype, name="bottleneck_down")(x)
        x = UNetBlockUp(enc_out[-1], self.dtype, name="bottleneck_up")(x)

        n_dec = len(dec_out)
        for i, c in enumerate(dec_out):
            x = UNetBlockUp(c, self.dtype, name=f"decoder_blocks_{i}")(
                jnp.concatenate([x, skips[i]], axis=-1),
                skip_last_activation=(i == n_dec - 1),
            )
        return x
