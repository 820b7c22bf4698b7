"""STFT / mel-spectrogram ops, formulated as matmuls for the MXU.

The reference computes 7 MelSpectrograms per train step for the multispectral
loss (networks/training.py:151-156, 354-361) and one full STFT per STFT
discriminator (networks/discriminator.py:179-186). FFTs are awkward for the
TPU's systolic array; instead, framing + window + DFT + normalization are
folded into two constant real matrices (cos/sin), so each spectrogram is

    frames (B*T, W) @ C (W, F)  and  frames @ S      ->  re, im on the MXU

with the mel projection a third matmul. Because the mel windows are zero-padded
*centered* into n_fft (torchaudio semantics: n_fft = max(window, 512) at
networks/training.py:152), only the `win_length` nonzero taps are gathered per
frame — the DFT matrices carry the centering phase, cutting frame memory by up
to 16x for the small windows.

Semantics match torchaudio defaults used by the reference:
  * MelSpectrogram: center=True (reflect pad n_fft//2), hann window,
    power=2, normalized=True (divide frames by sqrt(sum(window^2))),
    mel_scale='htk', f_min=0, f_max=sr/2, no filterbank norm.
  * torch.stft for the discriminator: rectangular window (none passed),
    normalized=True (x 1/sqrt(n_fft)), onesided=False, center=True.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(n: int) -> np.ndarray:
    """torch.hann_window(periodic=True)."""
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n)).astype(np.float64)


def hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(sample_rate: int, n_fft: int, n_mels: int, f_min: float = 0.0, f_max: float | None = None) -> np.ndarray:
    """Triangular HTK-scale mel filterbank, (n_freqs, n_mels), norm=None —
    torchaudio.functional.melscale_fbanks defaults."""
    if f_max is None:
        f_max = sample_rate / 2.0
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    m_min, m_max = hz_to_mel_htk(f_min), hz_to_mel_htk(f_max)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = mel_to_hz_htk(m_pts)
    # triangular filters
    f_diff = f_pts[1:] - f_pts[:-1]  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def dft_matrices(
    n_fft: int,
    win_length: int,
    window: np.ndarray | None,
    *,
    normalized: bool,
    onesided: bool,
) -> tuple[np.ndarray, np.ndarray, int]:
    """Real/imag DFT matrices of shape (win_length, n_bins), with the window,
    the centered zero-padding offset, and normalization folded in.

    Returns (C, S, frame_offset): for a frame f of `win_length` samples taken
    at `frame_start + frame_offset`,  re = f @ C, im = f @ S  equal the
    windowed DFT of the length-n_fft frame at `frame_start`.
    """
    if window is None:
        window = np.ones(win_length, dtype=np.float64)
    n_bins = n_fft if not onesided else n_fft // 2 + 1
    offset = (n_fft - win_length) // 2  # torch pads the window symmetrically
    j = np.arange(win_length, dtype=np.float64) + offset  # sample positions within the n_fft frame
    k = np.arange(n_bins, dtype=np.float64)
    ang = -2.0 * np.pi * np.outer(j, k) / n_fft
    scale = 1.0
    if normalized:
        scale = 1.0 / math.sqrt(float((window**2).sum()))
    C = (np.cos(ang) * window[:, None] * scale).astype(np.float32)
    S = (np.sin(ang) * window[:, None] * scale).astype(np.float32)
    return C, S, offset


def _frame(x, n_fft: int, hop: int, win_length: int, offset: int):
    """Center-pad (reflect) and gather frames of `win_length` samples.

    x: (..., L) -> (..., n_frames, win_length), n_frames = 1 + L // hop.
    """
    L = x.shape[-1]
    pad = n_fft // 2
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    n_frames = 1 + L // hop
    starts = np.arange(n_frames) * hop + offset
    idx = starts[:, None] + np.arange(win_length)[None, :]
    return x[..., idx]


@partial(jax.jit, static_argnames=("n_fft", "hop", "win_length", "offset"))
def _spec_matmul(x, C, S, *, n_fft: int, hop: int, win_length: int, offset: int):
    frames = _frame(x, n_fft, hop, win_length, offset)
    re = jnp.einsum("...tw,wf->...tf", frames, C, preferred_element_type=jnp.float32)
    im = jnp.einsum("...tw,wf->...tf", frames, S, preferred_element_type=jnp.float32)
    return re, im


@dataclass(frozen=True)
class MelSpectrogram:
    """One mel spectrogram config of the loss bank (reference:
    torchaudio.transforms.MelSpectrogram built at networks/training.py:151-156:
    n_fft=max(window,512), win_length=window, hop=window//4, n_mels=64,
    normalized=True)."""

    sample_rate: int
    win_length: int
    n_mels: int = 64
    min_n_fft: int = 512

    @property
    def n_fft(self) -> int:
        return max(self.win_length, self.min_n_fft)

    @property
    def hop_length(self) -> int:
        return self.win_length // 4

    def _constants(self):
        C, S, offset = dft_matrices(
            self.n_fft,
            self.win_length,
            hann_window(self.win_length),
            normalized=True,
            onesided=True,
        )
        fb = mel_filterbank(self.sample_rate, self.n_fft, self.n_mels)
        return C, S, fb, offset

    def __call__(self, x):
        """x: (..., L) -> mel power spectrogram (..., n_mels, n_frames),
        channel order matching torchaudio (mel bins before time)."""
        C, S, fb, offset = self._constants()
        re, im = _spec_matmul(
            x,
            jnp.asarray(C),
            jnp.asarray(S),
            n_fft=self.n_fft,
            hop=self.hop_length,
            win_length=self.win_length,
            offset=offset,
        )
        power = re * re + im * im  # (..., T, F)
        mel = jnp.einsum("...tf,fm->...tm", power, jnp.asarray(fb), preferred_element_type=jnp.float32)
        return jnp.swapaxes(mel, -1, -2)


def make_mel_bank(sample_rate: int, windows: Sequence[int], n_mels: int = 64):
    """The 7-window mel bank used by the multispectral loss
    (reference: networks/training.py:110,151-156: windows 2^5..2^11)."""
    return [MelSpectrogram(sample_rate, w, n_mels) for w in windows]


def stft_real_imag(x, n_fft: int, hop_length: int, win_length: int, *, normalized: bool = True):
    """Two-channel real-domain STFT for the STFT discriminators
    (reference: networks/discriminator.py:179-186: rectangular window,
    normalized=True, onesided=False, center=True (torch default)).

    x: (..., L) -> (..., T, F, 2) with F = n_fft (two-sided), channels (re, im)
    last so the discriminator's NHWC convs consume it directly.
    """
    C, S, offset = dft_matrices(n_fft, win_length, None, normalized=normalized, onesided=False)
    re, im = _spec_matmul(
        x,
        jnp.asarray(C),
        jnp.asarray(S),
        n_fft=n_fft,
        hop=hop_length,
        win_length=win_length,
        offset=offset,
    )
    return jnp.stack([re, im], axis=-1)
