"""Parameterized neural layers (flax.linen) over the functional ops.

Normalization parity with the reference's `add_util_norm`
(networks/utils.py:34-42): generator convs are weight-normed
(networks/vae.py:24), discriminator convs are spectral-normed
(networks/discriminator.py:21,65,106). Weight norm is a pure
reparameterization (v, g); spectral norm keeps its power-iteration vector in
the 'spectral' variable collection (updated when the caller passes
mutable=['spectral'], frozen at eval) — the functional analog of torch's
hook-based state.

Initialization follows torch Conv defaults (kaiming-uniform a=sqrt(5), i.e.
U(+-1/sqrt(fan_in))) so training dynamics are comparable to the reference.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from audio_generation_tpu.ops import (
    avg_pool1d,
    causal_conv1d,
    causal_conv_transpose1d,
    causal_upsample_conv1d,
    conv2d_same,
    same_conv1d,
    snake,
    snake_relu,
)
from audio_generation_tpu.ops.conv import (
    causal_upsample_conv1d_raw,
    folded_causal_conv1d,
)


def torch_conv_init(fan_in: int):
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _l2_normalize(x, eps=1e-12):
    return x / (jnp.linalg.norm(x) + eps)


class _NormedConvBase(nn.Module):
    """Shared weight-creation logic with 'weight' | 'spectral' | 'none' norm."""

    features: int = 0
    kernel_size: int = 1
    groups: int = 1
    use_bias: bool = True
    norm: str = "weight"
    n_power_iterations: int = 1

    def _weight(self, in_channels: int):
        shape = (self.kernel_size, in_channels // self.groups, self.features)
        fan_in = (in_channels // self.groups) * self.kernel_size
        if self.norm == "weight":
            v = self.param("v", torch_conv_init(fan_in), shape)
            # per-output-channel magnitude (torch weight_norm dim=0 semantics)
            g = self.param(
                "g",
                lambda key: jnp.linalg.norm(v.reshape(-1, self.features), axis=0),
            )
            norm = jnp.linalg.norm(v.reshape(-1, self.features), axis=0)
            w = v * (g / jnp.maximum(norm, 1e-12))
        elif self.norm == "spectral":
            w_raw = self.param("w", torch_conv_init(fan_in), shape)
            w = self._spectral_normalize(w_raw)
        else:
            w = self.param("w", torch_conv_init(fan_in), shape)
        b = (
            self.param("b", torch_conv_init(fan_in), (self.features,))
            if self.use_bias
            else None
        )
        return w, b

    def _spectral_normalize(self, w):
        """Torch-style spectral norm: the kernel viewed as (Cout, rest); one
        power-iteration step per call, with `u` persisted in the 'spectral'
        collection (mutable during training)."""
        mat = w.reshape(-1, self.features).T  # (Cout, K*Cin/g)
        u_var = self.variable(
            "spectral",
            "u",
            lambda: _l2_normalize(
                jax.random.normal(jax.random.key(0), (self.features,))
            ),
        )
        u = u_var.value
        for _ in range(self.n_power_iterations):
            v = _l2_normalize(jnp.matmul(u, mat))
            u = _l2_normalize(jnp.matmul(mat, v))
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
        sigma = jnp.einsum("i,ij,j->", u, mat, v)
        if not self.is_initializing() and not u_var.is_mutable():
            pass  # eval: reuse stored u without writing
        elif u_var.is_mutable():
            u_var.value = u
        return w / sigma


class CausalConv1d(_NormedConvBase):
    """Causal conv layer (reference: networks/vae.py:14-43).

    `fold` > 1 runs the exact lane-folded execution path (ops.conv.fold_time
    layout): input/output are (B, L/fold, fold*C); the learned weight keeps
    its canonical (k, Cin, Cout) shape, so checkpoints and parity transplants
    are unaffected. Stride-1, ungrouped only."""

    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x, fold: int = 1, return_weights: bool = False):
        if return_weights:
            # Create params exactly as the compute path would (same names,
            # shapes, init) but hand back the effective (w, b) instead of
            # convolving — the fused Pallas stack (ops/stack_pallas.py)
            # folds and applies them itself.
            w, b = self._weight(x.shape[-1] // fold)
            return w, b
        if fold > 1:
            assert self.stride == 1 and self.groups == 1
            w, b = self._weight(x.shape[-1] // fold)
            return folded_causal_conv1d(
                x, w.astype(x.dtype), None if b is None else b.astype(x.dtype),
                fold=fold, dilation=self.dilation,
            )
        w, b = self._weight(x.shape[-1])
        return causal_conv1d(
            x, w.astype(x.dtype), None if b is None else b.astype(x.dtype),
            stride=self.stride, dilation=self.dilation, groups=self.groups,
        )


class CausalConvT1d(_NormedConvBase):
    """Causal transposed conv layer (reference: networks/vae.py:45-64)."""

    stride: int = 1

    @nn.compact
    def __call__(self, x):
        w, b = self._weight(x.shape[-1])
        return causal_conv_transpose1d(
            x, w.astype(x.dtype), None if b is None else b.astype(x.dtype),
            stride=self.stride,
        )


class CausalUpsampleConv1d(_NormedConvBase):
    """Nearest-upsample then 'same' conv (reference: networks/vae.py:66-89).

    `emit_fold` > 1 returns the output in the fold_time layout
    (B, L_out/emit_fold, emit_fold*Cout) without materializing the unfolded
    tensor — the phase-decomposed conv already produces fold=stride, which is
    reshaped (flat, zero-cost) to the requested fold. Requires
    L_out % emit_fold == 0."""

    stride: int = 1

    @nn.compact
    def __call__(self, x, emit_fold: int = 1):
        w, b = self._weight(x.shape[-1])
        w = w.astype(x.dtype)
        b = None if b is None else b.astype(x.dtype)
        if emit_fold > 1 and self.stride > 1:
            y = causal_upsample_conv1d_raw(x, w, stride=self.stride)
            bsz, L, sc = y.shape
            l_out = L * self.stride
            assert l_out % emit_fold == 0
            y = y.reshape(bsz, l_out // emit_fold, emit_fold * self.features)
            if b is not None:
                y = y + jnp.tile(b, emit_fold)
            return y
        y = causal_upsample_conv1d(x, w, b, stride=self.stride)
        if emit_fold > 1:
            from audio_generation_tpu.ops.conv import fold_time

            y = fold_time(y, emit_fold)
        return y


class SameConv1d(_NormedConvBase):
    """Stride-1 symmetric-pad conv (reference: the wavelet-layer convs,
    networks/wavelets.py:191-199)."""

    @nn.compact
    def __call__(self, x):
        w, b = self._weight(x.shape[-1])
        return same_conv1d(
            x, w.astype(x.dtype), None if b is None else b.astype(x.dtype),
            groups=self.groups,
        )


class StridedConv1d(_NormedConvBase):
    """Plain torch-style strided conv (valid padding) used by the MelGAN
    discriminator blocks (networks/discriminator.py:33-41)."""

    stride: int = 1

    @nn.compact
    def __call__(self, x):
        w, b = self._weight(x.shape[-1])
        if x.shape[1] < self.kernel_size:
            raise ValueError(
                f"input length {x.shape[1]} < kernel {self.kernel_size}: the "
                f"discriminator stack needs a longer waveform (it shrinks by "
                f"its VALID convs; use clips of at least a few thousand samples)"
            )
        # reference passes no padding to these convs -> VALID
        y = jax.lax.conv_general_dilated(
            x,
            w.astype(x.dtype),
            window_strides=(self.stride,),
            padding=[(0, 0)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=self.groups,
            precision=jax.lax.Precision.HIGHEST
            if x.dtype != jnp.bfloat16
            else jax.lax.Precision.DEFAULT,
        )
        if b is not None:
            y = y + b.astype(x.dtype)
        return y


class Conv2dTorch(_NormedConvBase):
    """2-D conv with torch-style (k-1)//2 padding for the STFT discriminator
    (networks/discriminator.py:102-113,151-169). kernel/stride are (H, W)."""

    kernel_hw: Sequence[int] = (3, 3)
    stride_hw: Sequence[int] = (1, 1)
    padding_hw: Optional[Sequence[int]] = None

    def _weight2d(self, in_channels: int):
        kh, kw = self.kernel_hw
        shape = (kh, kw, in_channels, self.features)
        fan_in = in_channels * kh * kw
        if self.norm == "spectral":
            w_raw = self.param("w", torch_conv_init(fan_in), shape)
            w = self._spectral_normalize(w_raw)
        elif self.norm == "weight":
            v = self.param("v", torch_conv_init(fan_in), shape)
            g = self.param(
                "g",
                lambda key: jnp.linalg.norm(v.reshape(-1, self.features), axis=0),
            )
            norm = jnp.linalg.norm(v.reshape(-1, self.features), axis=0)
            w = v * (g / jnp.maximum(norm, 1e-12))
        else:
            w = self.param("w", torch_conv_init(fan_in), shape)
        b = (
            self.param("b", torch_conv_init(fan_in), (self.features,))
            if self.use_bias
            else None
        )
        return w, b

    @nn.compact
    def __call__(self, x):
        w, b = self._weight2d(x.shape[-1])
        return conv2d_same(
            x, w.astype(x.dtype), None if b is None else b.astype(x.dtype),
            stride=tuple(self.stride_hw),
            padding=None if self.padding_hw is None else tuple(self.padding_hw),
        )


class Snake(nn.Module):
    """Snake activation layer with learnable per-channel alpha
    (reference: Snek, networks/utils.py:75-89). Input (..., C)."""

    relu_variant: bool = False

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.ones, (x.shape[-1],))
        fn = snake_relu if self.relu_variant else snake
        return fn(x, alpha.astype(x.dtype))


class SqueezeExcite(nn.Module):
    """Channelwise gating (reference: networks/conditioning.py:3-24).
    Input (..., C)."""

    scale_factor: int = 2

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        hidden = dim // self.scale_factor
        cond = nn.Dense(hidden, name="squeeze")(x)
        cond = jax.nn.relu(cond)
        cond = nn.Dense(dim, name="excite")(cond)
        cond = jax.nn.sigmoid(cond)
        return x * cond


class FiLM(nn.Module):
    """Feature-wise linear modulation x*gamma(c) + beta(c); passthrough when
    the condition is None (reference: networks/conditioning.py:26-52)."""

    out_dim: Optional[int] = None
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, condition=None):
        if condition is None:
            return x
        out_dim = self.out_dim if self.out_dim is not None else x.shape[-1]
        gamma = nn.Dense(out_dim, name="gamma")(condition)[..., None, :]
        if self.use_bias:
            beta = nn.Dense(out_dim, name="beta")(condition)[..., None, :]
        else:
            beta = 0.0
        return x * gamma + beta
