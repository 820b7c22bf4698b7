"""Waveform signal ops: pre-emphasis, biquad low-pass, resampling.

TPU notes:
  * Pre-emphasis is a 2-tap FIR — a shift-and-subtract, fully fused by XLA.
  * The biquad low-pass is an order-2 IIR. A sequential scan over 72k samples
    would serialize the VPU, so the hot path converts it to a *truncated FIR*:
    the impulse response (computed by a tiny 512-step `lax.scan` from possibly
    traced coefficients) decays as |pole|^n — for the augmentation cutoffs the
    tail is < 1e-7 within a few hundred taps — and is applied as one
    convolution, which XLA maps to the vector/matrix units. Coefficients may
    be traced scalars, so the codebook-dependent cutoff (reference:
    networks/training.py:313-318) stays inside one compiled train step. An
    exact sequential-scan variant is kept for correctness testing.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def preemphasis(x, coeff: float = 0.97):
    """y[n] = x[n] - coeff * x[n-1], y[0] = x[0]
    (reference: torchaudio.functional.preemphasis used at
    networks/training.py:332-334). Works on (..., L)."""
    prev = jnp.concatenate([x[..., :1] * 0.0, x[..., :-1]], axis=-1)
    return x - coeff * prev


def lowpass_biquad_coeffs(cutoff_freq, sample_rate: float, q: float = 0.707):
    """RBJ cookbook low-pass coefficients, matching
    torchaudio.functional.lowpass_biquad (used at networks/training.py:316).
    `cutoff_freq` may be a traced scalar."""
    w0 = 2.0 * math.pi * cutoff_freq / sample_rate
    alpha = jnp.sin(w0) / (2.0 * q)
    cos_w0 = jnp.cos(w0)
    b0 = (1.0 - cos_w0) / 2.0
    b1 = 1.0 - cos_w0
    b2 = (1.0 - cos_w0) / 2.0
    a0 = 1.0 + alpha
    a1 = -2.0 * cos_w0
    a2 = 1.0 - alpha
    return (b0 / a0, b1 / a0, b2 / a0), (a1 / a0, a2 / a0)


def biquad_impulse_response(b_coeffs, a_coeffs, n_taps: int = 512):
    """Impulse response of the biquad (tiny sequential scan; coefficients may
    be traced). Returns (n_taps,)."""
    b0, b1, b2 = (jnp.asarray(v, dtype=jnp.float32) for v in b_coeffs)
    a1, a2 = (jnp.asarray(v, dtype=jnp.float32) for v in a_coeffs)
    x = jnp.zeros((n_taps,)).at[0].set(1.0)
    x1 = jnp.concatenate([jnp.zeros((1,)), x[:-1]])
    x2 = jnp.concatenate([jnp.zeros((2,)), x[:-2]])
    f = b0 * x + b1 * x1 + b2 * x2

    def step(carry, f_n):
        y1, y2 = carry
        y = f_n - a1 * y1 - a2 * y2
        return (y, y1), y

    _, h = jax.lax.scan(step, (jnp.float32(0.0), jnp.float32(0.0)), f)
    return h


def biquad_exact(x, b_coeffs, a_coeffs):
    """Exact sequential biquad along the last axis (zero initial conditions,
    matching torchaudio). Serializes on the time axis — use for testing and
    short signals; the training path uses the FIR truncation below."""
    b0, b1, b2 = b_coeffs
    a1, a2 = a_coeffs
    x1 = jnp.concatenate([x[..., :1] * 0.0, x[..., :-1]], axis=-1)
    x2 = jnp.concatenate([x[..., :2] * 0.0, x[..., :-2]], axis=-1)
    f = b0 * x + b1 * x1 + b2 * x2
    f_t = jnp.moveaxis(f, -1, 0)

    def step(carry, f_n):
        y1, y2 = carry
        y = f_n - a1 * y1 - a2 * y2
        return (y, y1), y

    zeros = jnp.zeros_like(f_t[0])
    _, y_t = jax.lax.scan(step, (zeros, zeros), f_t)
    return jnp.moveaxis(y_t, 0, -1)


def biquad(x, b_coeffs, a_coeffs, n_taps: int = 512):
    """Biquad via truncated-FIR (causal conv with the impulse response).

    For the low-pass augmentation cutoffs used in training the pole magnitude
    is << 1, so 512 taps bound the truncation error below float32 noise."""
    h = biquad_impulse_response(b_coeffs, a_coeffs, n_taps)
    shape = x.shape
    flat = x.reshape(-1, shape[-1], 1)
    # causal FIR: left-pad n_taps - 1; kernel reversed (conv as correlation)
    w = h[::-1][:, None, None]  # (K, 1, 1)
    y = jax.lax.conv_general_dilated(
        flat,
        w,
        window_strides=(1,),
        padding=[(n_taps - 1, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return y.reshape(shape)


def lowpass_biquad(x, sample_rate: float, cutoff_freq, q: float = 0.707, n_taps: int = 512):
    """Low-pass biquad on (..., L) (reference: networks/training.py:313-318;
    torchaudio.functional.lowpass_biquad semantics)."""
    b, a = lowpass_biquad_coeffs(cutoff_freq, sample_rate, q)
    return biquad(x, b, a, n_taps=n_taps)


# ---------------------------------------------------------------------------
# Resampling (host-side, numpy): windowed-sinc polyphase, the same family of
# kernel torchaudio.transforms.Resample uses (reference: built at
# networks/training.py:553-556 and applied inside the collator,
# networks/utils.py:149-174). Runs on the host data path, not on TPU.
# ---------------------------------------------------------------------------

def _resample_kernel(orig_freq: int, new_freq: int, lowpass_filter_width: int = 6, rolloff: float = 0.99):
    gcd = math.gcd(int(orig_freq), int(new_freq))
    orig = int(orig_freq) // gcd
    new = int(new_freq) // gcd
    base_freq = min(orig, new) * rolloff / 2.0  # cutoff in cycles per input sample * orig
    width = math.ceil(lowpass_filter_width * orig / base_freq / orig * orig)
    # time grid: for each output phase p (0..new-1), taps over input samples
    idx = np.arange(-width, width + orig, dtype=np.float64) / orig  # in input-sample units
    t = idx[None, :] - np.arange(new, dtype=np.float64)[:, None] / new  # (new, taps)
    t = t * orig
    cutoff = base_freq / orig * 2.0  # normalized (0..1) vs Nyquist of input
    t_scaled = t * cutoff * np.pi
    window = np.cos(np.clip(t * cutoff / lowpass_filter_width / 2.0 * np.pi, -np.pi / 2, np.pi / 2)) ** 2
    kernel = np.where(t_scaled == 0, 1.0, np.sin(t_scaled) / np.where(t_scaled == 0, 1.0, t_scaled))
    kernel = kernel * window * cutoff
    return kernel.astype(np.float32), orig, new, width


def resample(x: np.ndarray, orig_freq: int, new_freq: int) -> np.ndarray:
    """Polyphase windowed-sinc resample of (..., L) numpy audio."""
    if orig_freq == new_freq:
        return x
    kernel, orig, new, width = _resample_kernel(orig_freq, new_freq)
    shape = x.shape
    L = shape[-1]
    flat = x.reshape(-1, L).astype(np.float32)
    padded = np.pad(flat, ((0, 0), (width, width + orig)))
    out_len = int(math.ceil(L * new / orig))
    n_blocks = (L + orig - 1) // orig
    taps = kernel.shape[1]
    # gather strided frames: frame b covers padded[b*orig : b*orig + taps]
    windows = np.lib.stride_tricks.sliding_window_view(padded, taps, axis=-1)
    frames = windows[:, : n_blocks * orig : orig]  # (N, n_blocks, taps)
    out = np.einsum("nbt,pt->nbp", frames, kernel)  # (N, n_blocks, new)
    out = out.reshape(flat.shape[0], -1)[:, :out_len]
    return out.reshape(shape[:-1] + (out_len,))
