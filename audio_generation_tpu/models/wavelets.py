"""Multiresolution convolutions and the learned-wavelet upsampler.

Reference: networks/wavelets.py —
  * CausalMultiresConv1d (wavelets.py:38-96): learned low/high-pass depthwise
    filter pair (h0, h1) applied at dilations 1,2,4,...,2^depth with
    per-channel mixing weights w (arXiv:2305.01638, causal variant).
  * WaveletLayer (wavelets.py:123-234): projects input to hidden "frequency"
    channels, multiplies by a learned Gabor-like kernel
    cos(space) * exp(-space^2 / scale), and overlap-adds the per-frame
    waveforms into an upsampled signal.
  * MultiresScaleBlock (wavelets.py:98-121).

TPU notes: the reference's `unfold(n_points, fold_dim).sum(-1)` overlap-add
(wavelets.py:224-231) is a strided box-filter — here one `reduce_window`
(plus the reference's (scale_factor - 1)-sample tail patch-up, reproduced
exactly so shapes and streaming contracts match). Everything is channels-last.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from audio_generation_tpu.models.layers import SameConv1d
from audio_generation_tpu.ops import causal_conv1d, upsample_nearest


class CausalMultiresConv1d(nn.Module):
    """Causal multiresolution conv (reference: networks/wavelets.py:38-96).

    Input/output: (B, L, C) with C == channels.
    """

    channels: int
    kernel_size: int
    depth: int
    dropout: float = 0.0
    deterministic: bool = True

    @nn.compact
    def __call__(self, x):
        k, c = self.kernel_size, self.channels
        scalar = math.sqrt(2.0) / (k * 2)
        # depthwise filter pair, stored channels-last: (K, 1, C)
        h_init = lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -1.0, 1.0) * scalar
        h0 = self.param("h0", h_init, (k, 1, c))
        h1 = self.param("h1", h_init, (k, 1, c))
        w_scale = math.sqrt(2.0 / (2 * self.depth + 4))
        w = self.param(
            "w",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -1.0, 1.0) * w_scale,
            (c, self.depth + 2),
        )

        h0 = h0.astype(x.dtype)  # keep the compute dtype: a stray f32
        h1 = h1.astype(x.dtype)  # operand silently promotes the whole
        w = w.astype(x.dtype)  # downstream graph to f32 (see WaveletLayer)
        residual_low = x
        y = jnp.zeros_like(x)
        dilation = 1
        for i in range(self.depth, 0, -1):
            residual_high = causal_conv1d(residual_low, h1, dilation=dilation, groups=c)
            residual_low = causal_conv1d(residual_low, h0, dilation=dilation, groups=c)
            y = y + w[:, i] * residual_high
            dilation *= 2
        y = y + w[:, 0] * residual_low
        y = y + x * w[:, -1]
        y = jax.nn.gelu(y)
        if self.dropout > 0 and not self.deterministic:
            y = nn.Dropout(rate=self.dropout, deterministic=False)(y)
        return y


class MultiresScaleBlock(nn.Module):
    """Multires conv -> nearest upsample -> 1x1 conv -> GELU
    (reference: networks/wavelets.py:98-121; imported by vae.py:7 but not
    wired into the default model — provided for parity)."""

    out_channels: int
    scale_factor: int = 2
    kernel_size: int = 3
    multires_depth: int = 6
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x):
        x = CausalMultiresConv1d(
            channels=x.shape[-1],
            kernel_size=self.kernel_size,
            depth=self.multires_depth,
            dropout=self.dropout,
        )(x)
        x = upsample_nearest(x, self.scale_factor)
        x = SameConv1d(features=self.out_channels, kernel_size=1, norm="none")(x)
        return jax.nn.gelu(x)


def wavelet_two_tap_weights(kern32, scale_factor: int):
    """Two-tap closed form of the reference's overlap-add: window o = s*m + r
    of the contiguously-flattened wavelet train overlaps exactly wavelets m
    and m+1, so  y[b, s*m + r, h] = x[b,m,h]*A[h,r] + x[b,m+1,h]*B[h,r]  with
    B[h,r] = sum_{p < r*fold_dim} kern[h,p] and A = total - B.

    kern32: (H, n_points) f32 Gabor kernel. Returns (A, B), each (H, s) f32.
    """
    H, n_points = kern32.shape
    fold_dim = n_points // scale_factor
    csum = jnp.cumsum(kern32, axis=1)
    total = csum[:, -1:]
    starts = np.arange(scale_factor) * fold_dim  # (s,)
    B_w = jnp.concatenate(
        [jnp.zeros((H, 1), jnp.float32), csum[:, starts[1:] - 1]], axis=1
    )  # (H, s); B[:, 0] = 0
    return total - B_w, B_w


def wavelet_kernel(scale, space):
    """Gabor kernel cos(space)*exp(-space^2/scale), broadcast to (H, n)."""
    return jnp.cos(space) * jnp.exp(-(space**2) / scale)


class WaveletLayer(nn.Module):
    """Learned-wavelet upsampler (reference: networks/wavelets.py:123-234).

    conv_in projects (B, L, Cin) -> (B, L, H); each (frame, channel) scalar is
    expanded into an `n_points`-sample Gabor wavelet
    cos(space) * exp(-space^2 / wavelet_scale); frames are overlap-added at
    stride fold_dim = n_points // scale_factor, upsampling L -> L *
    scale_factor; conv_out mixes channels.
    """

    hidden_channels: int
    out_channels: Optional[int] = None
    wavelet_kernel_size: int = 13
    out_conv_kernel_size: int = 3
    scale_factor: int = 2
    n_points: int = 16
    interval: Sequence[float] = (-10.0, 10.0)
    wavelet_scale: float = 40.0
    multires_depth: int = 0
    channelwise_scale: bool = True

    @nn.compact
    def __call__(self, x):
        assert self.n_points % self.scale_factor == 0, "n_points % scale_factor != 0"
        out_channels = self.out_channels if self.out_channels is not None else x.shape[-1]
        fold_dim = self.n_points // self.scale_factor
        H = self.hidden_channels

        x = SameConv1d(
            features=H, kernel_size=self.wavelet_kernel_size, norm="none", name="conv_in"
        )(x)  # (B, L, H)

        if self.multires_depth > 0:
            # NOTE: the reference applies its multires block to the 4-D
            # post-unsqueeze tensor (wavelets.py:217-218), which convolves the
            # singleton wavelet axis; we apply it to the (B, L, H) projection
            # — the evident intent (default multires_depth=0 either way).
            x = CausalMultiresConv1d(
                channels=H, kernel_size=self.wavelet_kernel_size, depth=self.multires_depth
            )(x)

        space = jnp.linspace(self.interval[0], self.interval[1], self.n_points)
        if self.channelwise_scale:
            scale = self.param(
                "wavelet_scale",
                lambda key: jnp.full((H, 1), self.wavelet_scale, dtype=jnp.float32),
            )
        else:
            scale = self.param(
                "wavelet_scale",
                lambda key: jnp.asarray(self.wavelet_scale, dtype=jnp.float32),
            )
        # Gabor kernel per hidden channel: (H, n_points)
        kern = jnp.broadcast_to(wavelet_kernel(scale, space), (H, self.n_points))

        B, L, _ = x.shape
        s = self.scale_factor
        # The reference materializes the (B, L, H, n_points) wavelet train and
        # overlap-adds it with unfold().sum(-1) (wavelets.py:224-231). That
        # whole expand+box-sum is LINEAR in x — see wavelet_two_tap_weights.
        # On TPU this replaces a ~10x-input-sized f32 intermediate +
        # reduce_window with two elementwise multiplies (sums taken in f32).
        kern32 = kern.astype(jnp.float32)
        A_w, B_w = wavelet_two_tap_weights(kern32, s)  # (H, s) each
        x_next = jnp.concatenate([x[:, 1:], jnp.zeros_like(x[:, :1])], axis=1)
        y = (
            x[:, :, None, :] * A_w.T[None, None].astype(x.dtype)
            + x_next[:, :, None, :] * B_w.T[None, None].astype(x.dtype)
        )  # (B, L, s, H)
        y_out = y.reshape(B, L * s, H)
        # reference's tail patch-up (wavelets.py:229-231): the final
        # (scale_factor - 1) samples are RAW train samples x[L-1] * kern[-t]
        tail = s - 1
        if tail > 0:
            tail_vals = x[:, -1:, :] * kern.T[None, self.n_points - tail :, :].astype(
                x.dtype
            )
            y_out = jnp.concatenate([y_out[:, : L * s - tail], tail_vals], axis=1)

        y_out = SameConv1d(
            features=out_channels,
            kernel_size=self.out_conv_kernel_size,
            norm="none",
            name="conv_out",
        )(y_out)
        return y_out
