"""Pre-emphasis, biquad low-pass (associative-scan IIR), resample."""
import jax.numpy as jnp
import numpy as np
import pytest

from audio_generation_tpu.ops import lowpass_biquad, preemphasis, resample
from audio_generation_tpu.ops.signal import (
    biquad,
    biquad_exact,
    lowpass_biquad_coeffs,
)


def naive_biquad(x, b, a):
    b0, b1, b2 = b
    a1, a2 = a
    y = np.zeros_like(x)
    for n in range(x.shape[-1]):
        y[..., n] = (
            b0 * x[..., n]
            + (b1 * x[..., n - 1] if n >= 1 else 0)
            + (b2 * x[..., n - 2] if n >= 2 else 0)
            - (a1 * y[..., n - 1] if n >= 1 else 0)
            - (a2 * y[..., n - 2] if n >= 2 else 0)
        )
    return y


def test_preemphasis():
    x = np.array([[1.0, 2.0, 3.0, 4.0]], dtype=np.float32)
    y = preemphasis(jnp.asarray(x), 0.97)
    expected = np.array([[1.0, 2.0 - 0.97, 3.0 - 0.97 * 2, 4.0 - 0.97 * 3]])
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-6)


def test_biquad_exact_matches_sequential(rng):
    x = rng.normal(size=(2, 300)).astype(np.float32)
    b, a = lowpass_biquad_coeffs(5000.0, 24000.0)
    b = tuple(float(v) for v in b)
    a = tuple(float(v) for v in a)
    theirs = naive_biquad(x.astype(np.float64), b, a)
    ours = np.asarray(biquad_exact(jnp.asarray(x), b, a))
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-5)


def test_biquad_fir_matches_exact(rng):
    """The truncated-FIR hot path agrees with the exact IIR to fp32 noise."""
    x = rng.normal(size=(2, 300)).astype(np.float32)
    for cutoff in [500.0, 2000.0, 5000.0, 11000.0]:
        b, a = lowpass_biquad_coeffs(cutoff, 24000.0)
        b = tuple(float(v) for v in b)
        a = tuple(float(v) for v in a)
        exact = np.asarray(biquad_exact(jnp.asarray(x), b, a))
        fir = np.asarray(biquad(jnp.asarray(x), b, a))
        np.testing.assert_allclose(fir, exact, atol=2e-5)


def test_lowpass_attenuates_high_freqs():
    sr = 24000
    t = np.arange(2048) / sr
    low = np.sin(2 * np.pi * 200 * t).astype(np.float32)
    high = np.sin(2 * np.pi * 11000 * t).astype(np.float32)
    low_f = np.asarray(lowpass_biquad(jnp.asarray(low[None]), sr, 2000.0))
    high_f = np.asarray(lowpass_biquad(jnp.asarray(high[None]), sr, 2000.0))
    assert np.abs(low_f[..., 500:]).mean() > 0.5
    assert np.abs(high_f[..., 500:]).mean() < 0.05


def test_lowpass_traced_cutoff():
    """Cutoff can be a traced scalar (codebook-dependent augmentation,
    networks/training.py:313-318)."""
    import jax

    x = jnp.ones((1, 128))
    f = jax.jit(lambda x, c: lowpass_biquad(x, 24000.0, c))
    y1 = f(x, jnp.float32(5000.0))
    y2 = f(x, jnp.float32(8000.0))
    assert y1.shape == y2.shape == (1, 128)
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


def test_resample_identity(rng):
    x = rng.normal(size=(2, 1000)).astype(np.float32)
    np.testing.assert_array_equal(resample(x, 16000, 16000), x)


def test_resample_preserves_tone(rng):
    """A 440 Hz tone resampled 48k -> 24k stays a 440 Hz tone."""
    sr_in, sr_out = 48000, 24000
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)[None]
    y = resample(x, sr_in, sr_out)
    assert abs(y.shape[-1] - sr_out) <= 2
    t_out = np.arange(y.shape[-1]) / sr_out
    expected = np.sin(2 * np.pi * 440 * t_out).astype(np.float32)
    # ignore filter edge transients
    sl = slice(100, -100)
    np.testing.assert_allclose(y[0][sl], expected[sl], atol=5e-2)
