"""Adversaries: multi-scale waveform discriminator + STFT discriminators.

Reference: networks/discriminator.py —
  * WaveformDiscriminatorBlock (7-56): MelGAN-style (arXiv:1910.06711 App. A)
    — AvgPool front, grouped convs 16->1024 with kernels 15/41/41/41/41/5/3,
    strides 1/4/4/4/4/1/1, groups 1/4/16/64/256/1/1, spectral norm,
    LeakyReLU(0.2), optional final sigmoid; returns (score, all features).
  * WaveFormDiscriminator (58-82): 3 blocks at input scales 1/2/4.
  * STFTDiscriminator (119-197): two-channel real-domain STFT ->
    Conv2d(7x7) -> 6 blocks (channel multipliers [2,2,1,2,1,2], strides
    [(1,2),(2,2)]x3) -> final Conv2d with kernel (1, win / 2^(blocks+1)).

The sigmoid-activated scores combined with hinge loss are the reference's
"repulsion" against discriminator collapse (README.md:57; apply_sigmoid
defaults at discriminator.py:22,45-48,171-174).

Layouts are TPU-native: waveform (B, L, C), spectrogram NHWC = (B, T, F, 2).
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from audio_generation_tpu.models.layers import Conv2dTorch, StridedConv1d
from audio_generation_tpu.ops import avg_pool1d, leaky_relu, stft_real_imag


class WaveformDiscriminatorBlock(nn.Module):
    channel_sizes: Sequence[int] = (16, 64, 256, 512, 1024, 1024, 1024)
    kernel_sizes: Sequence[int] = (15, 41, 41, 41, 41, 5, 3)
    strides: Sequence[int] = (1, 4, 4, 4, 4, 1, 1)
    groups: Sequence[int] = (1, 4, 16, 64, 256, 1, 1)
    scale: int = 1
    norm: str = "spectral"
    apply_sigmoid: bool = True

    @nn.compact
    def __call__(self, x):
        features = []
        x = avg_pool1d(x, 2 * self.scale, self.scale, self.scale)
        features.append(x)
        n = len(self.channel_sizes)
        for i in range(n - 1):
            x = StridedConv1d(
                features=self.channel_sizes[i],
                kernel_size=self.kernel_sizes[i],
                stride=self.strides[i],
                groups=self.groups[i],
                norm=self.norm,
                name=f"conv{i}",
            )(x)
            x = leaky_relu(x, 0.2)
            features.append(x)
        x = StridedConv1d(
            features=1,
            kernel_size=self.kernel_sizes[-1],
            stride=self.strides[-1],
            groups=self.groups[-1],
            norm=self.norm,
            name="conv_out",
        )(x)
        features.append(x)
        score = jax.nn.sigmoid(x) if self.apply_sigmoid else x
        return score, features


class WaveFormDiscriminator(nn.Module):
    """3 blocks at input scales 1/2/4 (reference: discriminator.py:58-82).
    Block geometry is overridable (small banks for tests / ablations)."""

    n_blocks: int = 3
    scalefactor_per_block: int = 2
    norm: str = "spectral"
    name_tag: str = "waveform_discriminator"
    channel_sizes: Sequence[int] = (16, 64, 256, 512, 1024, 1024, 1024)
    kernel_sizes: Sequence[int] = (15, 41, 41, 41, 41, 5, 3)
    strides: Sequence[int] = (1, 4, 4, 4, 4, 1, 1)
    groups: Sequence[int] = (1, 4, 16, 64, 256, 1, 1)

    @nn.compact
    def __call__(self, x):
        outputs, features = [], []
        for i in range(self.n_blocks):
            out, feats = WaveformDiscriminatorBlock(
                scale=self.scalefactor_per_block**i,
                norm=self.norm,
                channel_sizes=self.channel_sizes,
                kernel_sizes=self.kernel_sizes,
                strides=self.strides,
                groups=self.groups,
                name=f"block{i}",
            )(x)
            outputs.append(out)
            features.extend(feats)
        return outputs, features


class STFTDiscriminatorBlock(nn.Module):
    """Conv2d(3x3, same) -> act -> strided Conv2d(k = stride + 2)
    (reference: discriminator.py:85-117)."""

    channel_multiplier: int
    stride_hw: Sequence[int]
    norm: str = "spectral"

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = Conv2dTorch(
            features=c, kernel_hw=(3, 3), stride_hw=(1, 1), norm=self.norm, name="conv1"
        )(x)
        h = leaky_relu(h, 0.2)
        sh, sw = self.stride_hw
        h = Conv2dTorch(
            features=c * self.channel_multiplier,
            kernel_hw=(sh + 2, sw + 2),
            stride_hw=(sh, sw),
            norm=self.norm,
            name="conv2",
        )(h)
        return h


class STFTDiscriminator(nn.Module):
    """Two-channel real-domain STFT discriminator
    (reference: discriminator.py:119-197)."""

    first_channel_size: int = 32
    channel_multipliers: Sequence[int] = (2, 2, 1, 2, 1, 2)
    strides: Sequence[Sequence[int]] = ((1, 2), (2, 2), (1, 2), (2, 2), (1, 2), (2, 2))
    win_length: int = 1024
    n_fft: Optional[int] = None
    hop_length: Optional[int] = None
    normalize_stft: bool = True
    norm: str = "spectral"
    apply_sigmoid: bool = True

    @nn.compact
    def __call__(self, x):
        # x: (B, L, 1) waveform -> (B, T, F, 2) two-sided STFT in NHWC
        n_fft = self.n_fft or self.win_length
        hop = self.hop_length or self.win_length // 4
        spec = stft_real_imag(
            x[..., 0], n_fft, hop, self.win_length, normalized=self.normalize_stft
        )
        h = Conv2dTorch(
            features=self.first_channel_size,
            kernel_hw=(7, 7),
            stride_hw=(1, 1),
            padding_hw=(3, 3),
            norm=self.norm,
            name="first_conv",
        )(spec)
        features = [h]
        for i, (mult, stride) in enumerate(zip(self.channel_multipliers, self.strides)):
            h = STFTDiscriminatorBlock(
                channel_multiplier=mult, stride_hw=tuple(stride), norm=self.norm,
                name=f"block{i}",
            )(h)
            features.append(h)
        final_kernel = self.win_length // (2 ** (len(self.channel_multipliers) + 1))
        if final_kernel < 1:
            raise ValueError(
                f"win_length {self.win_length} too small for "
                f"{len(self.channel_multipliers)} blocks (final kernel would be 0); "
                f"the reference uses windows >= 128"
            )
        h = Conv2dTorch(
            features=1,
            kernel_hw=(1, final_kernel),
            stride_hw=(1, 1),
            padding_hw=(0, (final_kernel - 1) // 2),
            norm=self.norm,
            name="final_conv",
        )(h)
        score = jax.nn.sigmoid(h) if self.apply_sigmoid else h
        return [score], features


def build_discriminators(stft_windows: Sequence[int] = (2048, 1024, 512, 256, 128), small: bool = False):
    """The reference's default adversary bank: one waveform discriminator +
    five STFT discriminators (networks/training.py:570-576). Returns
    (modules, names). `small=True` shrinks channel counts (same architecture
    and code paths) for CPU dry runs and tests."""
    if small:
        modules = [
            WaveFormDiscriminator(
                n_blocks=1,
                channel_sizes=(4, 8, 8, 8, 8, 8, 8),
                groups=(1, 2, 2, 2, 2, 1, 1),
            )
        ]
        names = ["waveform_discriminator"]
        for win in stft_windows[-2:]:
            modules.append(STFTDiscriminator(win_length=win, first_channel_size=4))
            names.append(f"stft_discriminator_{win}")
        return modules, names
    modules = [WaveFormDiscriminator()]
    names = ["waveform_discriminator"]
    for win in stft_windows:
        modules.append(STFTDiscriminator(win_length=win))
        names.append(f"stft_discriminator_{win}")
    return modules, names
