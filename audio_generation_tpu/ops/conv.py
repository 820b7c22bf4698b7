"""Causal 1-D convolution primitives, TPU-first.

Layout convention: activations are (batch, length, channels) — channels-last so
the channel dim rides the TPU lane dimension and convs lower onto the MXU as
batched matmuls. Weights are (kernel, in_channels, out_channels) ("WIO").

The *padding law* reproduces the reference's causal pad math exactly, which is
the behavioral spec for streamability and the stride-480 shape contract
(reference: networks/vae.py:32,39-43 for CausalConv1d; networks/vae.py:58-64
for the transposed right-crop; networks/vae.py:77-89 for the
upsample-then-same-conv variant; functional forms networks/wavelets.py:8-36):

    left_pad  = dilation * (kernel - 1) - stride + 1
    next_len  = (L - kernel + left_pad) / stride + 1
    target    = (ceil(next_len) - 1) * stride + kernel - left_pad
    right_pad = target - L            # "extra pad"

which guarantees out_len == ceil(L / stride) for the blocks used by the codec,
with output t depending only on inputs <= t*stride (strict causality).

All lengths are static under jit, so the pad arithmetic runs at trace time and
the padding is folded straight into `lax.conv_general_dilated` (no separate
pad op for XLA to materialize).
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

DIMENSION_NUMBERS = ("NWC", "WIO", "NWC")

# Precision policy: f32 inputs get exact f32 convs (Precision.HIGHEST) so
# goldens/indices are bit-stable; bfloat16 inputs (the model's
# `compute_dtype` fast path) use DEFAULT, which is the single-pass MXU mode.
PRECISION = jax.lax.Precision.HIGHEST


def _precision_for(x):
    if x.dtype == jnp.bfloat16:
        return jax.lax.Precision.DEFAULT
    return jax.lax.Precision.HIGHEST


def causal_pad_amounts(length: int, kernel_size: int, stride: int = 1, dilation: int = 1):
    """The reference pad law (networks/vae.py:32,39-43). Returns (left, right)."""
    pad = dilation * (kernel_size - 1) - stride + 1
    next_length = (length - kernel_size + pad) / stride + 1
    target_length = (math.ceil(next_length) - 1) * stride + kernel_size - pad
    extra_pad = target_length - length
    return pad, extra_pad


def causal_conv1d_out_length(length: int, kernel_size: int, stride: int = 1, dilation: int = 1) -> int:
    pad, extra = causal_pad_amounts(length, kernel_size, stride, dilation)
    eff_k = dilation * (kernel_size - 1) + 1
    return (length + pad + extra - eff_k) // stride + 1


def causal_conv1d(x, w, b=None, *, stride: int = 1, dilation: int = 1, groups: int = 1):
    """Causal conv. x: (B, L, Cin); w: (K, Cin//groups, Cout); out (B, ceil(L/s), Cout)."""
    k = w.shape[0]
    pad, extra = causal_pad_amounts(x.shape[1], k, stride, dilation)
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(pad, extra)],
        rhs_dilation=(dilation,),
        dimension_numbers=DIMENSION_NUMBERS,
        feature_group_count=groups,
        precision=_precision_for(x),
    )
    if b is not None:
        y = y + b
    return y


def causal_conv_transpose1d(x, w, b=None, *, stride: int = 1):
    """Causal transposed conv: full ('VALID') transposed conv of length
    (L-1)*stride + K, then crop `K - stride` samples off the right so the
    output length is exactly L*stride and output t only sees inputs <= t//s
    (reference: networks/vae.py:58-64)."""
    k = w.shape[0]
    # transpose_kernel=True interprets the kernel with I/O axes swapped, so
    # swap here to keep the framework-wide (K, Cin, Cout) weight convention.
    y = jax.lax.conv_transpose(
        x,
        w.swapaxes(1, 2),
        strides=(stride,),
        padding="VALID",
        dimension_numbers=DIMENSION_NUMBERS,
        transpose_kernel=True,  # torch ConvTranspose orientation: input i
        # contributes w[j] to output i*stride + j (spreads forward in time)
        precision=_precision_for(x),
    )
    right_crop = k - stride
    if right_crop > 0:
        y = y[:, : y.shape[1] - right_crop, :]
    if b is not None:
        y = y + b
    return y


def upsample_nearest(x, scale: int):
    """Nearest-neighbor temporal upsampling on (B, L, C): each frame repeated
    `scale` times (matches torch F.interpolate(mode='nearest') used at
    networks/vae.py:87)."""
    if scale == 1:
        return x
    b, l, c = x.shape
    return jnp.broadcast_to(x[:, :, None, :], (b, l, scale, c)).reshape(b, l * scale, c)


def same_conv1d(x, w, b=None, *, groups: int = 1):
    """Stride-1 'same'-padded conv (symmetric pad; odd kernels only in the
    codec). Reference: the post-upsample conv at networks/vae.py:78-83 and the
    wavelet in/out convs at networks/wavelets.py:191-199."""
    k = w.shape[0]
    left = (k - 1) // 2
    right = k - 1 - left
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,),
        padding=[(left, right)],
        dimension_numbers=DIMENSION_NUMBERS,
        feature_group_count=groups,
        precision=_precision_for(x),
    )
    if b is not None:
        y = y + b
    return y


def _upsample_phase_fold(kernel_size: int, stride: int):
    """Static fold matrix for the phase decomposition of
    nearest-upsample + 'same' conv (see causal_upsample_conv1d).

    Output position t = s*u + r reads x[u + m(j, r)] with
    m(j, r) = floor((r + j - left) / s): nearest upsampling repeats each input
    sample s times, so all taps j with the same m hit the SAME input sample
    and their weights sum. Returns (A, m_min, K') where A is the
    (K'*s, k) 0/1 fold matrix ordered (i, r) with i = m - m_min."""
    k, s = kernel_size, stride
    left = (k - 1) // 2
    ms = np.array([[(r + j - left) // s for j in range(k)] for r in range(s)])
    m_min, m_max = int(ms.min()), int(ms.max())
    kp = m_max - m_min + 1
    A = np.zeros((kp * s, k), dtype=np.float32)
    for r in range(s):
        for j in range(k):
            i = ms[r, j] - m_min
            A[i * s + r, j] = 1.0
    return A, m_min, kp


def upsample_phase_kernel(w, stride: int):
    """The phase-decomposed kernel of nearest-upsample + 'same' conv:
    returns (wp, m_min, kp) with wp (kp, Cin, stride*Cout) such that a
    stride-1 conv of x with wp (padding (-m_min, kp-1+m_min)) followed by
    depth-to-space equals upsample_nearest + same_conv1d. Folding is done in
    f32 (exact tap sums); cast wp to the compute dtype at use site."""
    k = w.shape[0]
    cin, cout = w.shape[1], w.shape[2]
    A, m_min, kp = _upsample_phase_fold(k, stride)
    wp = jnp.einsum("pj,jio->pio", jnp.asarray(A), w.astype(jnp.float32))
    wp = (
        wp.reshape(kp, stride, cin, cout)
        .transpose(0, 2, 1, 3)
        .reshape(kp, cin, stride * cout)
    )
    return wp, m_min, kp


def causal_upsample_conv1d_raw(x, w, *, stride: int):
    """Phase-decomposed upsample-conv WITHOUT the final depth-to-space:
    returns (B, L, stride*Cout), i.e. the result already in the fold_time
    layout with f = stride (phase-major). Bias is NOT added (tile it stride
    times in the folded layout, or add after unfolding)."""
    wp, m_min, kp = upsample_phase_kernel(w, stride)
    wp = wp.astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x,
        wp,
        window_strides=(1,),
        padding=[(-m_min, kp - 1 + m_min)],
        dimension_numbers=DIMENSION_NUMBERS,
        precision=_precision_for(x),
    )  # (B, L, s*Cout)


def causal_upsample_conv1d(x, w, b=None, *, stride: int = 1):
    """Upsample-then-conv ("checkerboard-free") upsampler
    (reference: networks/vae.py:66-89). NOTE: like the reference, the 'same'
    conv after upsampling looks ahead (K-1)//2 upsampled samples — the
    streaming runtime accounts for this lookahead explicitly.

    TPU-first lowering: instead of materializing the s-times-repeated input
    and convolving at the upsampled rate (s x the FLOPs, s x the HBM traffic
    of the mathematically necessary work), run the EXACT phase decomposition —
    one conv at the LOW rate with kernel ~k/s+1 and s*Cout output channels
    (repeated-sample taps pre-summed into the kernel), then depth-to-space.
    Same function, ~k/(k/s+1) x fewer FLOPs, and s x wider output lanes for
    the MXU. Equality vs the naive composition is tested to f32 tolerance."""
    if stride == 1:
        return same_conv1d(x, w, b)
    y = causal_upsample_conv1d_raw(x, w, stride=stride)
    bsz, L = y.shape[0], y.shape[1]
    cout = w.shape[2]
    y = y.reshape(bsz, L * stride, cout)
    if b is not None:
        y = y + b
    return y


def fold_time(x, f: int):
    """(B, L, C) -> (B, L//f, f*C), phase-major: out[b, u, r*C + c] =
    x[b, u*f + r, c]. A pure reshape of the row-major (time, channel) layout.

    WHY: activations with C < 128 pad the TPU lane dimension (physical HBM
    footprint and VPU/MXU occupancy are ceil(C/128)*128 wide), so the long
    low-channel codec stages (C=32 at 72 kHz rate) waste 4x bandwidth and
    lanes. Folding f consecutive samples into channels makes them dense."""
    if f == 1:
        return x
    b, l, c = x.shape
    assert l % f == 0, f"length {l} not divisible by fold {f}"
    return x.reshape(b, l // f, f * c)


def unfold_time(x, f: int, channels: int):
    """Inverse of fold_time: (B, L/f, f*C) -> (B, L, C)."""
    if f == 1:
        return x
    b, lf, fc = x.shape
    assert fc == f * channels
    return x.reshape(b, lf * f, channels)


def polyphase_dilated_conv1d(x, w, b=None, *, dilation: int, fold: int = 1):
    """Exact causal stride-1 DILATED conv via polyphase-in-time decomposition.

    y[t] = sum_j w[j] x[t - d*(k-1) + d*j] touches only samples with
    t ≡ x-index (mod d), so with t = m*d + i the conv splits into d
    independent d=1 causal convs over the subsequences x[:, i::d, :]
    (identical pad law: (k-1) leading zeros per subsequence). The phase axis
    moves into the batch dim (one real transpose each way), and each
    subsequence then runs the lane-folded d=1 conv — folded-kernel FLOP
    ratio k_f*f/k at d=1 (1.71x for k=7, f=4) instead of the dilated folded
    ratio (8.57x at d=9, f=4; see tools/flop_audit.py).

    x: (B, L, C) UNFOLDED layout, L % dilation == 0. `fold` is applied to
    the subsequences when (L/dilation) % fold == 0. Returns (B, L, Cout).
    Equality vs causal_conv1d / folded_causal_conv1d is tested on CPU f32
    (tests/test_conv_ops.py)."""
    d = dilation
    if d == 1:
        y = folded_causal_conv1d(fold_time(x, fold), w, b, fold=fold)
        return unfold_time(y, fold, w.shape[2])
    bsz, L, cin = x.shape
    assert L % d == 0, f"length {L} not divisible by dilation {d}"
    cout = w.shape[2]
    xp = (
        x.reshape(bsz, L // d, d, cin)
        .transpose(0, 2, 1, 3)
        .reshape(bsz * d, L // d, cin)
    )
    f = fold if (L // d) % fold == 0 else 1
    y = folded_causal_conv1d(fold_time(xp, f), w, b, fold=f)
    y = unfold_time(y, f, cout)
    return (
        y.reshape(bsz, d, L // d, cout)
        .transpose(0, 2, 1, 3)
        .reshape(bsz, L, cout)
    )


def aligned_dilated_conv1d(x, w, b=None, *, dilation: int):
    """Exact causal stride-1 dilated conv in a DILATION-ALIGNED fold layout:
    fold f = d. With t = u*d + r, tap j reads x[t - d*(k-1) + d*j] — the SAME
    phase r, folded frame u - (k-1) + j. So in the fold_time(d) layout the
    conv is a stride-1, dilation-1, k-tap GROUPED conv (feature_group_count
    = d, every group sharing the weight): issued MACs == true MACs (no
    folded-kernel blowup — cf. 8.57x for the dense folded kernel at d=9 f=4,
    tools/flop_audit.py), lanes d*C wide, and the layout changes are pure
    reshapes (fold_time law). Requires L % d == 0.

    x: (B, L, C) unfolded; returns (B, L, Cout)."""
    d = dilation
    if d == 1:
        return causal_conv1d(x, w, b)
    bsz, L, cin = x.shape
    assert L % d == 0, f"length {L} not divisible by dilation {d}"
    k, _, cout = w.shape
    xf = fold_time(x, d)
    wg = jnp.tile(w, (1, 1, d)).astype(x.dtype)  # (k, C, d*Cout): one copy per group
    y = jax.lax.conv_general_dilated(
        xf,
        wg,
        window_strides=(1,),
        padding=[(k - 1, 0)],
        dimension_numbers=DIMENSION_NUMBERS,
        feature_group_count=d,
        precision=_precision_for(x),
    )
    if b is not None:
        y = y + jnp.tile(b, d).astype(y.dtype)
    return unfold_time(y, d, cout)


def _fold_matrix(kernel_size: int, dilation: int, f: int):
    """Static 0/1 tensor M (k'', f_in_phase, f_out_phase, k) mapping the
    original causal kernel w (k, Cin, Cout) onto the folded kernel
    W'[i, rp*Cin + c, r*Cout + o] = sum_j M[i, rp, r, j] * w[j, c, o].

    Derivation: stride-1 causal conv y[t] = sum_j w[j] x[t - d(k-1) + d*j]
    (x[<0] = 0). With t = f*u + r the source offset o_jr = r - d(k-1) + d*j
    lands in folded block m = floor(o_jr / f), phase rp = o_jr mod f; the
    conv over folded blocks uses kernel index i = m - m_min."""
    k, d = kernel_size, dilation
    m_min = -((d * (k - 1) + f - 1) // f)  # floor((0 - d(k-1)) / f)
    kpp = -m_min + 1  # m ranges m_min..0
    M = np.zeros((kpp, f, f, k), dtype=np.float32)
    for r in range(f):
        for j in range(k):
            o = r - d * (k - 1) + d * j
            M[(o // f) - m_min, o % f, r, j] = 1.0
    return M, m_min, kpp


def folded_causal_conv1d(x_f, w, b=None, *, fold: int, dilation: int = 1):
    """Exact causal stride-1 conv computed in the folded layout.

    x_f: (B, L/f, f*Cin) from fold_time; w: (k, Cin, Cout) (UNCHANGED param
    shape — folding is an execution strategy, not a reparameterization).
    Returns (B, L/f, f*Cout). Matches fold_time(causal_conv1d(x, w)) up to
    f32 tap-reassociation (~1e-6 rel)."""
    k, cin, cout = w.shape
    f = fold
    if f == 1:
        return causal_conv1d(x_f, w, b, dilation=dilation)
    M, m_min, kpp = _fold_matrix(k, dilation, f)
    wf = jnp.einsum("isrj,jco->iscro", jnp.asarray(M), w.astype(jnp.float32))
    wf = wf.reshape(kpp, f * cin, f * cout).astype(x_f.dtype)
    y = jax.lax.conv_general_dilated(
        x_f,
        wf,
        window_strides=(1,),
        padding=[(-m_min, 0)],
        dimension_numbers=DIMENSION_NUMBERS,
        precision=_precision_for(x_f),
    )
    if b is not None:
        y = y + jnp.tile(b, f).astype(y.dtype)
    return y


def conv2d_same(x, w, b=None, *, stride=(1, 1), padding=None):
    """2-D conv on (B, H, W, C) with torch-style explicit symmetric padding.

    Used by the STFT discriminators (reference: networks/discriminator.py:102-113,
    151-169), whose torch convs use padding = (k-1)//2 per side (so even
    kernels shrink by one, exactly like torch)."""
    kh, kw = w.shape[0], w.shape[1]
    if padding is None:
        padding = ((kh - 1) // 2, (kw - 1) // 2)
    ph, pw = padding
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=tuple(stride),
        padding=[(ph, ph), (pw, pw)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=_precision_for(x),
    )
    if b is not None:
        y = y + b
    return y


def avg_pool1d(x, kernel_size: int, stride: int, padding: int):
    """torch-style AvgPool1d on (B, L, C): count_include_pad=True semantics
    (reference: the MelGAN discriminator front pool,
    networks/discriminator.py:32)."""
    summed = jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        window_dimensions=(1, kernel_size, 1),
        window_strides=(1, stride, 1),
        padding=[(0, 0), (padding, padding), (0, 0)],
    )
    return summed / kernel_size


@partial(jax.jit, static_argnames=("window", "step"))
def box_fold(y, window: int, step: int):
    """Overlap-add box sum: out[w] = sum_{t<window} y[..., w*step + t].

    This is the fixed-shape reformulation of the reference WaveletLayer's
    `unfold(n_points, fold_dim).sum(-1)` overlap-add (networks/wavelets.py:226)
    — a strided box-filter, lowered via `reduce_window` (fuses on TPU)."""
    return jax.lax.reduce_window(
        y,
        0.0,
        jax.lax.add,
        window_dimensions=(1,) * (y.ndim - 1) + (window,),
        window_strides=(1,) * (y.ndim - 1) + (step,),
        padding="valid",
    )
