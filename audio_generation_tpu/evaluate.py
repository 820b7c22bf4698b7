"""Codec quality evaluation: SNR, SI-SDR, multiscale mel distance, bitrate.

The reference publishes no quality numbers (BASELINE.md); this module defines
the framework's own evaluation so codec quality is measurable per config
(BASELINE.json configs) and trackable across training runs.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from audio_generation_tpu.ops.stft import make_mel_bank


def snr_db(reference, estimate, eps: float = 1e-12):
    """Signal-to-noise ratio in dB over the last axis."""
    reference = jnp.asarray(reference)
    estimate = jnp.asarray(estimate)
    noise = reference - estimate
    ratio = jnp.sum(reference**2, axis=-1) / (jnp.sum(noise**2, axis=-1) + eps)
    return 10.0 * jnp.log10(ratio + eps)


def si_sdr_db(reference, estimate, eps: float = 1e-12):
    """Scale-invariant SDR (dB): project the estimate onto the reference
    before computing the ratio (Le Roux et al., 2019)."""
    reference = jnp.asarray(reference)
    estimate = jnp.asarray(estimate)
    ref_zm = reference - jnp.mean(reference, axis=-1, keepdims=True)
    est_zm = estimate - jnp.mean(estimate, axis=-1, keepdims=True)
    alpha = jnp.sum(est_zm * ref_zm, axis=-1, keepdims=True) / (
        jnp.sum(ref_zm**2, axis=-1, keepdims=True) + eps
    )
    target = alpha * ref_zm
    noise = est_zm - target
    ratio = jnp.sum(target**2, axis=-1) / (jnp.sum(noise**2, axis=-1) + eps)
    return 10.0 * jnp.log10(ratio + eps)


# jitted: ~15 eager device ops per eval call otherwise (each one a remote
# tunnel round-trip on TPU — keep every eval/metric path jitted)
@jax.jit
def _wave_metrics(x, y):
    return jnp.mean(snr_db(x, y)), jnp.mean(si_sdr_db(x, y))


_MEL_CACHE: dict = {}


def mel_distance(reference, estimate, sample_rate: int, windows: Sequence[int] = (512, 1024, 2048)):
    """Mean L1 distance between log-mel spectrograms across windows."""
    key = (sample_rate, tuple(windows))
    fn = _MEL_CACHE.get(key)
    if fn is None:
        bank = make_mel_bank(sample_rate, windows)

        @jax.jit
        def fn(a_in, b_in):
            total = 0.0
            for mel in bank:
                a = jnp.log(mel(a_in) + 1e-5)
                b = jnp.log(mel(b_in) + 1e-5)
                total = total + jnp.mean(jnp.abs(a - b))
            return total / len(bank)

        _MEL_CACHE[key] = fn
    return fn(jnp.asarray(reference), jnp.asarray(estimate))


_STFT_CACHE: dict = {}


def stft_distance(reference, estimate, windows: Sequence[int] = (512, 1024, 2048)):
    """Multi-resolution STFT distances (Parallel WaveGAN / codec-paper
    standard, complementary to the phase-structure-blind mel-L1):

      spectral_convergence = || |S(x)| - |S(y)| ||_F / || |S(x)| ||_F
      log_stft_l1          = mean | log|S(x)| - log|S(y)| |

    averaged over the window bank (hop = window // 4). Returns a dict."""
    key = tuple(windows)
    fn = _STFT_CACHE.get(key)
    if fn is None:
        from audio_generation_tpu.ops.stft import stft_real_imag

        @jax.jit
        def fn(a_in, b_in):
            sc = 0.0
            lm = 0.0
            for w in windows:
                sa = stft_real_imag(a_in, w, w // 4, w)  # (..., T, F, 2)
                sb = stft_real_imag(b_in, w, w // 4, w)
                mag_a = jnp.sqrt(jnp.sum(sa**2, axis=-1) + 1e-12)
                mag_b = jnp.sqrt(jnp.sum(sb**2, axis=-1) + 1e-12)
                sc = sc + jnp.linalg.norm(mag_a - mag_b) / (
                    jnp.linalg.norm(mag_a) + 1e-12
                )
                lm = lm + jnp.mean(jnp.abs(jnp.log(mag_a) - jnp.log(mag_b)))
            n = float(len(windows))
            return sc / n, lm / n

        _STFT_CACHE[key] = fn
    sc, lm = fn(jnp.asarray(reference), jnp.asarray(estimate))
    return {"spectral_convergence": float(sc), "log_stft_l1": float(lm)}


def codec_bitrate_bps(num_quantizers: int, codebook_size, sample_rate: int, stride: int) -> float:
    """Nominal coded bitrate (reference: bitrate math at utils.py:137-147)."""
    sizes = codebook_size if isinstance(codebook_size, (list, tuple)) else [codebook_size] * num_quantizers
    bits_per_frame = sum(math.log2(s) for s in sizes)
    return bits_per_frame * sample_rate / stride


_FWD_CACHE: dict = {}


def _jitted_eval_forward(model):
    """Jit-per-model eval forward (eager per-op dispatch through the remote
    TPU tunnel costs seconds per op — minutes per eval batch). Keyed by repr:
    modules with dict-valued fields (e.g. energy_kwargs) are unhashable."""
    key = repr(model)
    fn = _FWD_CACHE.get(key)
    if fn is None:
        @jax.jit
        def fn(variables, inp, codebook_n):
            (y, _commit, indices), _ = model.apply(
                variables, inp, False, codebook_n, mutable=["codebook"]
            )
            return y, indices

        _FWD_CACHE[key] = fn
    return fn


def evaluate_codec(model, variables, waves: np.ndarray, sample_rate: int, codebook_n: Optional[int] = None):
    """Round-trip a batch of (B, L) waveforms; returns a metrics dict."""
    x = jnp.asarray(waves, dtype=jnp.float32)
    stride = model.scale_factor
    L = (x.shape[-1] // stride) * stride
    x = x[:, :L]
    inp = x[:, :, None] if model.input_format == "b l c" else x[:, None, :]
    y, indices = _jitted_eval_forward(model)(variables, inp, codebook_n)
    y = y[:, :, 0] if model.input_format == "b l c" else y[:, 0, :]
    snr, sisdr = _wave_metrics(x, y)
    return {
        "snr_db": float(snr),
        "si_sdr_db": float(sisdr),
        "mel_l1": float(mel_distance(x, y, sample_rate)),
        **stft_distance(x, y),
        "bitrate_bps": codec_bitrate_bps(
            model.num_quantizers, model.codebook_size, sample_rate, stride
        ),
        "latent_fps": sample_rate / stride,
    }
