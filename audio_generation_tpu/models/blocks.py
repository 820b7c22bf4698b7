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
from audio_generation_tpu.ops.conv import fold_time, unfold_time


def _pick_fold(length: int, channels: int, target_lanes: int = 128) -> int:
    """Largest fold factor f with f*channels <= target_lanes and f | length.
    1 when channels already fill the lanes (or nothing divides)."""
    f_max = max(target_lanes // max(channels, 1), 1)
    # largest divisor of `length` that is <= f_max (not just halvings of
    # f_max, which could e.g. skip f=3 for length 36000*3 at f_max=6)
    for f in range(f_max, 1, -1):
        if length % f == 0:
            return f
    return 1


class CausalResidualBlock1d(nn.Module):
    """x + conv1x1(act(conv_k(x, dilation))) with optional depthwise
    factorization (reference: networks/vae.py:91-117).

    `fold` > 1: x is (B, L/fold, fold*channels) in the fold_time layout and
    the whole block runs lane-folded (exact; see ops.conv.folded_causal_conv1d
    — low-channel stages otherwise pad the 128-wide TPU lane dim 2-4x)."""

    channels: int
    kernel_size: int = 7
    dilation: int = 1
    dropout: float = 0.0
    depthwise: bool = False
    deterministic: bool = True
    fold: int = 1  # a FIELD (not a call arg) so nn.remat needs no
    # static_argnums: the parent constructs this block where fold is known

    @nn.compact
    def __call__(self, x, return_weights: bool = False):
        fold = self.fold
        if return_weights:
            # Param-creating weight extraction for the fused Pallas stack
            # (ops/stack_pallas.py): identical param tree, no compute.
            assert not self.depthwise
            w1, b1 = CausalConv1d(
                features=self.channels,
                kernel_size=self.kernel_size,
                dilation=self.dilation,
                name="conv1",
            )(x, fold=fold, return_weights=True)
            w2, b2 = CausalConv1d(
                features=self.channels, kernel_size=1, name="conv2"
            )(x, fold=fold, return_weights=True)
            return w1, b1, w2, b2
        if self.depthwise:
            assert fold == 1, "depthwise + folded not supported"
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
            )(x, fold=fold)
        h = leaky_relu(h, 0.1)
        h = CausalConv1d(features=self.channels, kernel_size=1, name="conv2")(
            h, fold=fold
        )
        if self.dropout > 0 and not self.deterministic:
            h = nn.Dropout(rate=self.dropout, deterministic=False)(h)
        return x + h


def _run_stack(mod, x, c: int, fold: int):
    """The shared dilated residual stack of CausalEncoderBlock /
    CausalDecoderBlock: (n_layers - 1) residual blocks (dilations 3^i) with a
    LeakyReLU(0.1) after each (reference: networks/vae.py:119-148,150-202).

    When `mod.pallas_stack` is set and the folded activation is 128 or 256
    lanes wide, the whole stack runs as ONE fused Pallas kernel
    (ops/stack_pallas.py): identical math and param tree, one HBM round trip
    instead of six. Falls back to the per-block XLA path otherwise (including
    at init, mirroring use_pallas_rvq)."""
    dilations = tuple(3**i for i in range(mod.n_layers - 1))
    if (
        mod.pallas_stack
        and not mod.depthwise
        and fold * c in (128, 256)
        and not mod.is_initializing()
    ):
        blocks_w = tuple(
            CausalResidualBlock1d(
                channels=c, dilation=d, fold=fold, name=f"res{i}"
            )(x, return_weights=True)
            for i, d in enumerate(dilations)
        )
        from audio_generation_tpu.ops.stack_pallas import fused_residual_stack

        return fused_residual_stack(x, blocks_w, fold=fold, dilations=dilations)
    Res = nn.remat(CausalResidualBlock1d) if mod.remat else CausalResidualBlock1d
    for i, d in enumerate(dilations):
        x = Res(
            channels=c,
            dilation=d,
            depthwise=mod.depthwise,
            fold=fold,
            name=f"res{i}",
        )(x)
        x = leaky_relu(x, 0.1)
    return x


class CausalEncoderBlock(nn.Module):
    """(n_layers - 1) dilated residual blocks (dilations 3^i) then a strided
    downsampling conv with kernel 2*stride + 1; LeakyReLU(0.1) throughout
    (reference: networks/vae.py:119-148)."""

    out_channels: int
    stride: int
    n_layers: int = 4
    depthwise: bool = False
    lane_fold: bool = True  # exact lane-folded residual stack when C < 128
    remat: bool = False  # rematerialize each residual block in backward
    pallas_stack: bool = False  # fused VMEM-resident stack (ops/stack_pallas.py)

    @nn.compact
    def __call__(self, x, in_fold: int = 1):
        """`in_fold` > 1: x arrives already in the fold_time layout (e.g.
        straight from a folded stem conv) — avoids an unfold/refold round
        trip when the stack's own fold factor matches."""
        c = x.shape[-1] // in_fold
        length = x.shape[1] * in_fold
        fold = _pick_fold(length, c) if (
            self.lane_fold and not self.depthwise
        ) else 1
        if in_fold != fold:
            if in_fold > 1:
                x = unfold_time(x, in_fold, c)
            if fold > 1:
                x = fold_time(x, fold)
        x = _run_stack(self, x, c, fold)
        if fold > 1:
            x = unfold_time(x, fold, c)
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
    lane_fold: bool = True  # exact lane-folded residual stack when C < 128
    remat: bool = False  # rematerialize each residual block in backward
    pallas_stack: bool = False  # fused VMEM-resident stack (ops/stack_pallas.py)

    @nn.compact
    def __call__(self, x):
        l_out = x.shape[1] * self.stride
        fold = _pick_fold(l_out, self.out_channels) if (
            self.lane_fold and not self.depthwise
        ) else 1
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
            if fold > 1:
                x = fold_time(x, fold)
        elif self.upsample:
            # the phase-decomposed upsampler already produces fold=stride; it
            # re-folds (a flat reshape) straight to the stack's fold factor
            x = CausalUpsampleConv1d(
                features=self.out_channels,
                kernel_size=2 * self.stride + 1,
                stride=self.stride,
                name="up",
            )(x, emit_fold=fold)
        else:
            x = CausalConvT1d(
                features=self.out_channels,
                kernel_size=2 * self.stride + 1,
                stride=self.stride,
                name="up_t",
            )(x)
            if fold > 1:
                x = fold_time(x, fold)
        x = leaky_relu(x, 0.1)
        x = _run_stack(self, x, self.out_channels, fold)
        if fold > 1:
            x = unfold_time(x, fold, self.out_channels)
        return x
