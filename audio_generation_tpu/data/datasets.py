"""Datasets: CommonVoice (tsv-driven), LibriSpeech (directory layout),
synthetic mixed-sinusoid audio, plus the augmentations.

Reference:
  * COMMONVOICE (networks/datasets.py:14-89): reads `<root>/train.tsv`,
    loads `<root>/clips/<path>.wav`, yields (waveform, sample_rate, metadata
    dict with client_id/sentence/age/gender/accent fields).
  * get_dataset registry (networks/utils.py:222-236).
  * overtones / introduce_disharmony augmentations
    (networks/datasets.py:91-136).
  * simple_mixed_sin synthetic signal (networks/wavelets.py:245-251) — the
    reference's de-facto fake dataset, used here as a first-class dataset so
    the whole pipeline runs with no downloads.
"""
from __future__ import annotations

import csv
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from audio_generation_tpu.data.wavio import read_wav


class CommonVoice:
    """tsv-driven CommonVoice dataset (expects wav clips, as produced by the
    reference's convert_to_wav.py)."""

    EXT_AUDIO = ".wav"
    FOLDER_AUDIO = "clips"

    def __init__(self, root: str, tsv: str = "train.tsv"):
        self._path = os.fspath(root)
        tsv_path = os.path.join(self._path, tsv)
        with open(tsv_path, "r", encoding="utf-8") as f:
            walker = csv.reader(f, delimiter="\t")
            self._header = next(walker)
            self._walker = list(walker)
        if self._header[1] != "path":
            raise ValueError(f"expected header[1] == 'path', got {self._header[1]}")

    def __len__(self) -> int:
        return len(self._walker)

    def __getitem__(self, n: int) -> Tuple[np.ndarray, int, Dict[str, str]]:
        line = self._walker[n]
        fileid = line[1]
        filename = os.path.join(self._path, self.FOLDER_AUDIO, fileid)
        if not filename.endswith(self.EXT_AUDIO):
            filename += self.EXT_AUDIO
        waveform, sample_rate = read_wav(filename)
        return waveform, sample_rate, dict(zip(self._header, line))


class LibriSpeech:
    """LibriSpeech-layout dataset: <root>/<url>/<speaker>/<chapter>/*.{flac,wav}
    (the reference uses torchaudio's LIBRISPEECH at 16 kHz,
    networks/utils.py:224-226, consuming the archive AS DISTRIBUTED — flac).
    Flac files decode through the native C++ decoder
    (native/flac_decoder.cpp via data/flacio.py), so no conversion pass is
    needed; wav files are read with the stdlib reader."""

    def __init__(self, root: str, url: str = "train-clean-100"):
        base = os.path.join(os.fspath(root), url)
        if not os.path.isdir(base):
            base = os.fspath(root)  # allow pointing straight at the split
        self._files: List[str] = []
        for dirpath, _dirnames, filenames in os.walk(base):
            for fn in sorted(filenames):
                if fn.endswith((".wav", ".flac")):
                    self._files.append(os.path.join(dirpath, fn))

    def __len__(self) -> int:
        return len(self._files)

    def __getitem__(self, n: int) -> Tuple[np.ndarray, int, Dict[str, str]]:
        from audio_generation_tpu.data.flacio import read_audio

        waveform, sample_rate = read_audio(self._files[n])
        return waveform, sample_rate, {"path": self._files[n]}


def simple_mixed_sin(
    num_freqs: int,
    interval: np.ndarray,
    freq_range: float = 20.0,
    shift: float = 5.0,
    rng: Optional[np.random.Generator] = None,
):
    """Mixture-of-sinusoids signal (reference: networks/wavelets.py:245-251).
    Returns (freqs sorted, signal (1, 1, len(interval)))."""
    if rng is None:
        rng = np.random.default_rng()
    freqs = np.sort(rng.random(num_freqs) * freq_range + shift)
    sins = np.sin(2 * np.pi * freqs[:, None] * interval[None, :])
    return freqs, sins.mean(axis=0, keepdims=True)[None].astype(np.float32)


class SyntheticAudio:
    """Deterministic-seeded synthetic speech-like dataset: harmonic stacks
    with slow amplitude/frequency modulation plus noise — lets the full
    pipeline (and benchmarks) run with zero external data."""

    def __init__(self, length: int = 72000, sample_rate: int = 24000, n_items: int = 256, seed: int = 0):
        self.length = length
        self.sample_rate = sample_rate
        self.n_items = n_items
        self.seed = seed

    def __len__(self) -> int:
        return self.n_items

    def __getitem__(self, n: int) -> Tuple[np.ndarray, int, Dict[str, str]]:
        rng = np.random.default_rng(self.seed * 100003 + n)
        t = np.arange(self.length) / self.sample_rate
        f0 = rng.uniform(80, 300)
        vibrato = 1.0 + 0.01 * np.sin(2 * np.pi * rng.uniform(4, 7) * t)
        x = np.zeros_like(t, dtype=np.float64)
        for h in range(1, 6):
            amp = rng.uniform(0.1, 1.0) / h
            x += amp * np.sin(2 * np.pi * f0 * h * vibrato * t + rng.uniform(0, 2 * np.pi))
        envelope = 0.5 * (1 + np.sin(2 * np.pi * rng.uniform(0.5, 2.0) * t))
        x = x * envelope + rng.normal(0, 0.01, x.shape)
        x = (x / (np.abs(x).max() + 1e-6) * 0.7).astype(np.float32)
        return x[None, :], self.sample_rate, {"f0": f"{f0:.1f}"}


def overtones(length: int, freq: float, n_overtones: int = 5, sample_rate: int = 16000, peak: float = 0.125):
    """Harmonic-stack generator (reference: networks/datasets.py:91-96)."""
    t = np.arange(length, dtype=np.float32) / sample_rate * (freq * 2 * np.pi)
    stack = np.sin(t[None, :] * np.arange(1, n_overtones + 1)[:, None]).mean(0)
    return stack / np.abs(stack).max() * peak


def introduce_disharmony(
    waveform: np.ndarray,
    magnitude_scale: float = 0.5,
    offset_range: Tuple[int, int] = (1, 80),
    n_segments: Optional[int] = None,
    segment_length: Optional[int] = None,
    rng: Optional[np.random.Generator] = None,
):
    """FFT-domain augmentation: boost a random bin offset from each segment's
    dominant frequency (reference: networks/datasets.py:98-136).
    waveform: (B, C, L)."""
    if rng is None:
        rng = np.random.default_rng()
    spectrum = np.fft.fft(waveform)
    magnitude = np.abs(spectrum)
    max_magnitude = magnitude.max()

    b, c, l = waveform.shape
    if segment_length is not None:
        n_segments = l // segment_length
    if n_segments is None:
        n_segments = 1
    seg_len = l // n_segments
    spectrum = spectrum.reshape(b, c, n_segments, seg_len)
    magnitude = magnitude.reshape(b, c, n_segments, seg_len)

    dominant = magnitude.argmax(axis=-1)
    offset = rng.integers(*offset_range, size=dominant.shape)
    target = (dominant + offset) % seg_len
    bi = np.arange(b)[:, None, None]
    ci = np.arange(c)[None, :, None]
    ni = np.arange(n_segments)[None, None, :]
    spectrum[bi, ci, ni, target] += magnitude_scale * max_magnitude
    return np.fft.ifft(spectrum.reshape(b, c, l)).real.astype(waveform.dtype)


def get_dataset(name: str, path: str = "", **kwargs):
    """Dataset registry (reference: networks/utils.py:222-236).
    Returns (dataset, native_sample_rate)."""
    if name == "librispeech":
        return LibriSpeech(path), 16000
    if name == "commonvoice":
        return CommonVoice(path), 48000
    if name == "synthetic":
        sr = kwargs.pop("sample_rate", 24000)
        return SyntheticAudio(sample_rate=sr, **kwargs), sr
    raise ValueError(f"Dataset {name!r} not recognised")
