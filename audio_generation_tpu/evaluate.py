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


_MCD_CACHE: dict = {}


def mcd_db(reference, estimate, sample_rate: int, n_mels: int = 80,
           n_coeffs: int = 13, window: int = 1024):
    """Mel-cepstral distortion (dB), the standard objective perceptual metric
    for speech synthesis/coding (Kubichek 1993): MFCCs from a DCT-II of the
    log10 mel spectrogram, c0 (frame energy) excluded,

        MCD = (10 / ln 10) * mean_t sqrt(2 * sum_{k=1..K} (cx_k - cy_k)^2).

    Unlike mel-L1 this lives on a compressed, liftered axis that tracks
    spectral-envelope (formant) fidelity — the thing adversarial training is
    supposed to improve (VERDICT r3 weak #7: the eval suite had no metric a
    GAN win could show up on)."""
    key = (sample_rate, n_mels, n_coeffs, window)
    fn = _MCD_CACHE.get(key)
    if fn is None:
        from audio_generation_tpu.ops.stft import MelSpectrogram

        mel = MelSpectrogram(sample_rate, window, n_mels)
        # orthonormal DCT-II rows 1..K as a matmul (TPU-friendly; no FFT)
        n = np.arange(n_mels)
        k = np.arange(1, n_coeffs + 1)
        D = np.sqrt(2.0 / n_mels) * np.cos(
            np.pi * (n[None, :] + 0.5) * k[:, None] / n_mels
        )  # (K, n_mels)
        Dm = jnp.asarray(D, dtype=jnp.float32)

        @jax.jit
        def fn(a_in, b_in):
            la = jnp.log10(mel(a_in) + 1e-10)  # (..., n_mels, T)
            lb = jnp.log10(mel(b_in) + 1e-10)
            ca = jnp.einsum("km,...mt->...kt", Dm, la)
            cb = jnp.einsum("km,...mt->...kt", Dm, lb)
            d2 = jnp.sum((ca - cb) ** 2, axis=-2)  # (..., T)
            return jnp.mean((10.0 / jnp.log(10.0)) * jnp.sqrt(2.0 * d2 + 1e-12))

        _MCD_CACHE[key] = fn
    return float(fn(jnp.asarray(reference), jnp.asarray(estimate)))


_STOI_CACHE: dict = {}


def stoi_proxy(reference, estimate, sample_rate: int, n_bands: int = 15,
               seg_frames: int = 30, window: int = 512):
    """Short-time objective intelligibility proxy (Taal et al. 2011 STOI
    structure): one-third-octave band envelopes from an STFT, normalized +
    clipped estimate segments, correlation with the clean segments, averaged.

    Deviations from calibrated STOI (documented, deliberate): runs at the
    codec's native sample rate instead of resampling to 10 kHz (window 512 @
    24 kHz = 21.3 ms vs STOI's 25.6 ms frames), no silent-frame removal.
    Values are therefore an uncalibrated 0-1 intelligibility *proxy*: valid
    for comparing codecs/checkpoints on the same material, not for absolute
    STOI claims."""
    key = (sample_rate, n_bands, seg_frames, window)
    fn = _STOI_CACHE.get(key)
    if fn is None:
        from audio_generation_tpu.ops.stft import stft_real_imag

        hop = window // 2
        n_freqs = window // 2 + 1
        freqs = np.fft.rfftfreq(window, 1.0 / sample_rate)
        cf = 150.0 * 2.0 ** (np.arange(n_bands) / 3.0)  # third-octave centers
        lo, hi = cf / 2 ** (1 / 6), cf * 2 ** (1 / 6)
        band = ((freqs[:, None] >= lo[None, :]) & (freqs[:, None] < hi[None, :]))
        Bm = jnp.asarray(band.astype(np.float32))  # (F, n_bands)
        beta = 10.0 ** (-15.0 / 20.0)  # -15 dB SDR clipping bound

        @jax.jit
        def fn(a_in, b_in):
            def envelopes(x):
                s = stft_real_imag(x, window, hop, window)  # (..., T, F', 2)
                p = jnp.sum(s**2, axis=-1)[..., :n_freqs]
                return jnp.sqrt(p @ Bm + 1e-12)  # (..., T, n_bands)

            ex, ey = envelopes(a_in), envelopes(b_in)
            T = ex.shape[-2]
            # clips shorter than one analysis segment degenerate gracefully
            # (constant segments -> correlation 0) instead of going empty
            n_seg = max(T - seg_frames + 1, 1)
            idx = jnp.minimum(
                jnp.arange(n_seg)[:, None] + jnp.arange(seg_frames)[None, :],
                T - 1,
            )
            # (..., n_seg, seg_frames, n_bands) rolling analysis segments
            sx = jnp.take(ex, idx, axis=-2)
            sy = jnp.take(ey, idx, axis=-2)
            # per-(segment, band) energy normalization of the estimate
            nx = jnp.sqrt(jnp.sum(sx**2, axis=-2, keepdims=True) + 1e-12)
            ny = jnp.sqrt(jnp.sum(sy**2, axis=-2, keepdims=True) + 1e-12)
            sy = sy * (nx / ny)
            sy = jnp.minimum(sy, (1.0 + beta) * sx)  # STOI clipping
            sx = sx - jnp.mean(sx, axis=-2, keepdims=True)
            sy = sy - jnp.mean(sy, axis=-2, keepdims=True)
            num = jnp.sum(sx * sy, axis=-2)
            den = jnp.sqrt(
                jnp.sum(sx**2, axis=-2) * jnp.sum(sy**2, axis=-2)
            ) + 1e-12
            return jnp.mean(num / den)

        _STOI_CACHE[key] = fn
    return float(fn(jnp.asarray(reference), jnp.asarray(estimate)))


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
    out = {
        "snr_db": float(snr),
        "si_sdr_db": float(sisdr),
        "mel_l1": float(mel_distance(x, y, sample_rate)),
        **stft_distance(x, y),
        "mcd_db": mcd_db(x, y, sample_rate),
        "stoi_proxy": stoi_proxy(x, y, sample_rate),
        "bitrate_bps": codec_bitrate_bps(
            model.num_quantizers, model.codebook_size, sample_rate, stride
        ),
        "latent_fps": sample_rate / stride,
    }
    # effective bitrate from codebook-usage perplexity (honest counterpart of
    # the nominal rate when entries are dead — VERDICT r3 weak #4)
    qstate = (variables.get("codebook") or {}).get("state")
    if model.bottleneck in ("rvq", "energy_rvq") and qstate is not None:
        perp = model.quantizer.codebook_perplexity(qstate)
        out["effective_bitrate_bps"] = float(
            np.sum(np.log2(np.maximum(perp, 1.0))) * sample_rate / stride
        )
        # ACTUAL coded rate: range-code this batch's indices against the
        # checkpoint's usage priors (exactly what `codec_cli encode
        # --entropy` ships), so the effective-rate estimate above is backed
        # by real bytes on real eval audio. Skipped under codebook_n
        # truncation (deep indices are emitted but not transmitted there).
        if codebook_n is None:
            from audio_generation_tpu import entropy as _entropy

            priors = model.quantizer.entropy_priors(qstate)
            idx_np = np.asarray(indices)
            nbytes = sum(
                len(_entropy.encode_level(idx_np[..., q].reshape(-1), priors[q]))
                for q in range(idx_np.shape[-1])
            )
            seconds = idx_np.shape[0] * idx_np.shape[1] * stride / sample_rate
            out["coded_bitrate_bps"] = 8.0 * nbytes / seconds
    return out
