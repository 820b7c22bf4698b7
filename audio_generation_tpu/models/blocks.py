"""Codec building blocks (reference: networks/vae.py:91-202).

All blocks are channels-last (B, L, C). Activations default to
LeakyReLU(0.1) as in the reference's generator.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from audio_generation_tpu.models.layers import (
    CausalConv1d,
    CausalConvT1d,
    CausalUpsampleConv1d,
)
from audio_generation_tpu.models.wavelets import WaveletLayer
from audio_generation_tpu.ops import leaky_relu


class CausalResidualBlock1d(nn.Module):
    """x + conv1x1(act(conv_k(x, dilation))) with optional depthwise
    factorization (reference: networks/vae.py:91-117)."""

    channels: int
    kernel_size: int = 7
    dilation: int = 1
    dropout: float = 0.0
    depthwise: bool = False
    deterministic: bool = True

    @nn.compact
    def __call__(self, x):
        if self.depthwise:
            h = CausalConv1d(
                features=x.shape[-1], kernel_size=1, groups=x.shape[-1], name="dw"
            )(x)
            h = CausalConv1d(
                features=self.channels,
                kernel_size=self.kernel_size,
                dilation=self.dilation,
                name="conv1",
            )(h)
        else:
            h = CausalConv1d(
                features=self.channels,
                kernel_size=self.kernel_size,
                dilation=self.dilation,
                name="conv1",
            )(x)
        h = leaky_relu(h, 0.1)
        h = CausalConv1d(features=self.channels, kernel_size=1, name="conv2")(h)
        if self.dropout > 0 and not self.deterministic:
            h = nn.Dropout(rate=self.dropout, deterministic=False)(h)
        return x + h


class CausalEncoderBlock(nn.Module):
    """(n_layers - 1) dilated residual blocks (dilations 3^i) then a strided
    downsampling conv with kernel 2*stride + 1; LeakyReLU(0.1) throughout
    (reference: networks/vae.py:119-148)."""

    out_channels: int
    stride: int
    n_layers: int = 4
    depthwise: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_layers - 1):
            x = CausalResidualBlock1d(
                channels=x.shape[-1],
                dilation=3**i,
                depthwise=self.depthwise,
                name=f"res{i}",
            )(x)
            x = leaky_relu(x, 0.1)
        x = CausalConv1d(
            features=self.out_channels,
            kernel_size=2 * self.stride + 1,
            stride=self.stride,
            name="down",
        )(x)
        return leaky_relu(x, 0.1)


class CausalDecoderBlock(nn.Module):
    """Upsampler (WaveletLayer / CausalUpsampleConv1d / CausalConvT1d chosen
    by flags, reference: networks/vae.py:150-202) then dilated residual
    blocks."""

    out_channels: int
    stride: int
    n_layers: int = 4
    depthwise: bool = False
    upsample: bool = True
    wavelet: bool = False
    wavelet_hidden_ratio: int = 4
    channelwise: bool = True

    @nn.compact
    def __call__(self, x):
        if self.wavelet:
            x = WaveletLayer(
                hidden_channels=self.out_channels * self.wavelet_hidden_ratio,
                out_channels=self.out_channels,
                scale_factor=self.stride,
                wavelet_kernel_size=2 * self.stride + 1,
                n_points=2 * self.stride * self.wavelet_hidden_ratio,
                channelwise_scale=self.channelwise,
                name="up_wavelet",
            )(x)
        elif self.upsample:
            x = CausalUpsampleConv1d(
                features=self.out_channels,
                kernel_size=2 * self.stride + 1,
                stride=self.stride,
                name="up",
            )(x)
        else:
            x = CausalConvT1d(
                features=self.out_channels,
                kernel_size=2 * self.stride + 1,
                stride=self.stride,
                name="up_t",
            )(x)
        x = leaky_relu(x, 0.1)
        for i in range(self.n_layers - 1):
            x = CausalResidualBlock1d(
                channels=self.out_channels,
                dilation=3**i,
                depthwise=self.depthwise,
                name=f"res{i}",
            )(x)
            x = leaky_relu(x, 0.1)
        return x
