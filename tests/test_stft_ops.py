"""Matmul-STFT/mel vs an independent numpy FFT reference."""
import jax.numpy as jnp
import numpy as np
import pytest

from audio_generation_tpu.ops import MelSpectrogram, mel_filterbank, stft_real_imag
from audio_generation_tpu.ops.stft import hann_window


def numpy_stft(x, n_fft, hop, win_length, window, normalized, onesided):
    """Independent reference: torch.stft semantics via numpy FFT."""
    L = x.shape[-1]
    pad = n_fft // 2
    xp = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    if window is None:
        win = np.ones(win_length)
    else:
        win = window
    # center-pad window to n_fft
    off = (n_fft - win_length) // 2
    win_full = np.zeros(n_fft)
    win_full[off : off + win_length] = win
    n_frames = 1 + L // hop
    frames = np.stack([xp[..., i * hop : i * hop + n_fft] for i in range(n_frames)], axis=-2)
    frames = frames * win_full
    spec = np.fft.fft(frames, n=n_fft, axis=-1)
    if onesided:
        spec = spec[..., : n_fft // 2 + 1]
    if normalized:
        spec = spec / np.sqrt((win_full**2).sum())
    return spec  # (..., T, F)


@pytest.mark.parametrize("win", [32, 128, 512])
def test_mel_spectrogram_matches_numpy(rng, win):
    sr = 24000
    x = rng.normal(size=(2, 4800)).astype(np.float32)
    mel = MelSpectrogram(sr, win)
    ours = np.asarray(mel(jnp.asarray(x)))  # (B, n_mels, T)

    spec = numpy_stft(x, mel.n_fft, mel.hop_length, win, hann_window(win), True, True)
    power = np.abs(spec) ** 2
    fb = mel_filterbank(sr, mel.n_fft, 64)
    expected = power @ fb  # (B, T, n_mels)
    expected = np.swapaxes(expected, -1, -2)
    assert ours.shape == expected.shape
    np.testing.assert_allclose(ours, expected, rtol=1e-3, atol=1e-5)


def test_stft_real_imag_matches_numpy(rng):
    x = rng.normal(size=(1, 2048)).astype(np.float32)
    n_fft = 256
    out = np.asarray(stft_real_imag(jnp.asarray(x), n_fft, n_fft // 4, n_fft))
    spec = numpy_stft(x, n_fft, n_fft // 4, n_fft, None, True, False)
    assert out.shape == (1, spec.shape[1], n_fft, 2)
    np.testing.assert_allclose(out[..., 0], spec.real, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(out[..., 1], spec.imag, rtol=1e-3, atol=1e-4)


def test_mel_filterbank_properties():
    fb = mel_filterbank(24000, 512, 64)
    assert fb.shape == (257, 64)
    assert (fb >= 0).all()
    # every mel filter has some support
    assert (fb.sum(axis=0) > 0).all()


def test_mel_frame_count():
    sr = 24000
    x = jnp.zeros((1, 72000))
    mel = MelSpectrogram(sr, 2048)
    y = mel(x)
    assert y.shape == (1, 64, 1 + 72000 // 512)
