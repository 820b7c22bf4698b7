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


class PseudoSpeech:
    """Speech-LIKE synthetic dataset (no reference counterpart): glottal
    pulse trains shaped by time-varying formant envelopes, with voiced and
    unvoiced (noise-burst) syllables, syllable-rate amplitude modulation and
    pauses.

    Why it exists: the harmonic `SyntheticAudio` gives adversarial training
    nothing perceptual to learn (QUALITY_r03.md finding 2 — the GAN verdict
    is confounded by the data), and real speech corpora are unavailable in
    an offline image. This generator produces broadband, formant-structured,
    onset-rich audio — the signal class the discriminator bank (MelGAN
    waveform + STFT, networks/discriminator.py) was designed for.

    Synthesis, per utterance (all numpy, deterministic per (seed, index)):
      1. speaker draw: base f0 in [85, 240] Hz, vocal-tract length scale;
      2. syllable segmentation (120-320 ms), each voiced (p=.75) or
         unvoiced, with 8% pauses;
      3. voiced source: phase-accumulated impulse train at a slowly-walking
         f0 (+ vibrato + jitter), double one-pole lowpass for glottal tilt;
         unvoiced source: first-difference (highpassed) white noise;
      4. formant shaping: per-syllable vowel targets (F1-F3 from a 5-vowel
         table, linearly coarticulated across boundaries + random detune),
         applied as Gaussian-bump magnitude envelopes on 20 ms Hann frames
         via overlap-add (vectorized rFFT filtering, no scipy);
      5. syllable attack/decay envelope + soft normalization.
    """

    VOWELS = np.array(  # (F1, F2, F3) Hz — classic Peterson-Barney-ish means
        [[730.0, 1090.0, 2440.0],   # /a/
         [530.0, 1840.0, 2480.0],   # /e/
         [270.0, 2290.0, 3010.0],   # /i/
         [570.0, 840.0, 2410.0],    # /o/
         [300.0, 870.0, 2240.0]]    # /u/
    )
    BANDWIDTHS = np.array([90.0, 120.0, 180.0])  # Gaussian bump sigmas, Hz

    def __init__(self, length: int = 72000, sample_rate: int = 24000,
                 n_items: int = 256, seed: int = 0, cache: bool = False):
        self.length = length
        self.sample_rate = sample_rate
        self.n_items = n_items
        self.seed = seed
        # synthesis costs ~140 ms/item (OLA formant filtering dominates);
        # items are deterministic per (seed, n), so an in-RAM cache makes
        # every epoch after the first free (~280 MB per 1024 3-s items f32).
        # Thread-safe under concurrent data workers: worst case two threads
        # synthesize the same item and one write wins (identical values).
        self._cache: Optional[Dict[int, np.ndarray]] = {} if cache else None

    def __len__(self) -> int:
        return self.n_items

    # -- synthesis pieces -------------------------------------------------- #
    def _segments(self, rng) -> List[Tuple[int, int, int]]:
        """[(start, end, kind)]: kind 0 = voiced, 1 = unvoiced, 2 = pause."""
        out, pos = [], 0
        while pos < self.length:
            dur = int(rng.uniform(0.12, 0.32) * self.sample_rate)
            kind = 0 if rng.uniform() < 0.75 else 1
            if rng.uniform() < 0.08:
                kind = 2
            out.append((pos, min(pos + dur, self.length), kind))
            pos += dur
        return out

    @staticmethod
    def _onepole_lowpass(x: np.ndarray, a: float) -> np.ndarray:
        """y[n] = (1-a) x[n] + a y[n-1], vectorized via the closed-form
        geometric convolution in log-space chunks (exact, no scan loop)."""
        # y = (1-a) * sum_k a^k x[n-k]; do it with an FFT-sized kernel long
        # enough that a^K is negligible
        K = min(int(np.ceil(np.log(1e-6) / np.log(max(a, 1e-9)))), len(x))
        kern = (1 - a) * a ** np.arange(K)
        return np.convolve(x, kern)[: len(x)]

    def _voiced_source(self, rng, n: int, f0_base: float) -> np.ndarray:
        sr = self.sample_rate
        t = np.arange(n) / sr
        # slow f0 random walk + vibrato + per-period jitter
        walk = np.cumsum(rng.normal(0, 0.4, n)) / sr
        walk -= np.linspace(0, walk[-1], n)
        f0 = f0_base * (1 + 0.05 * np.sin(2 * np.pi * rng.uniform(4, 6.5) * t)
                        * 0.2 + 0.6 * walk) * rng.uniform(0.95, 1.05)
        f0 = np.clip(f0, 60.0, 320.0)
        phase = np.cumsum(f0) / sr
        pulses = np.zeros(n)
        wraps = np.flatnonzero(np.diff(np.floor(phase)) > 0)
        jitter = rng.integers(0, 2, size=wraps.shape)
        idx = np.clip(wraps + jitter, 0, n - 1)
        pulses[idx] = 1.0
        # glottal tilt + lip radiation net ~ -6 dB/oct: one one-pole lowpass
        a = np.exp(-2 * np.pi * 500.0 / sr)
        return self._onepole_lowpass(pulses, a)

    def _formant_filter(self, rng, x: np.ndarray, segs, scale: float) -> np.ndarray:
        """20 ms Hann OLA frames x Gaussian formant-bump magnitude response."""
        sr = self.sample_rate
        win, hop = int(0.02 * sr), int(0.01 * sr)
        n = len(x)
        pad = np.concatenate([x, np.zeros(win)])
        starts = np.arange(0, n, hop)
        frames = np.stack([pad[s : s + win] for s in starts]) * np.hanning(win)
        spec = np.fft.rfft(frames, axis=1)
        freqs = np.fft.rfftfreq(win, 1 / sr)

        # per-syllable vowel targets, linearly interpolated at frame centers
        centers = starts + win // 2
        targets = np.zeros((len(segs), 3))
        for i, _ in enumerate(segs):
            v = self.VOWELS[rng.integers(0, len(self.VOWELS))]
            targets[i] = v * scale * rng.uniform(0.94, 1.06, size=3)
        seg_mid = np.array([(s + e) / 2 for s, e, _ in segs])
        F = np.stack([np.interp(centers, seg_mid, targets[:, k])
                      for k in range(3)], axis=1)  # (n_frames, 3)

        gain = np.full((len(starts), len(freqs)), 0.05)
        for k, fg in enumerate((1.0, 0.8, 0.6)):
            bw = self.BANDWIDTHS[k] * scale
            gain += fg * np.exp(-((freqs[None, :] - F[:, k : k + 1]) ** 2)
                                / (2 * bw * bw))
        shaped = np.fft.irfft(spec * gain, n=win, axis=1)

        out = np.zeros(n + win)
        for fi, s in enumerate(starts):  # OLA (hann @ 50% overlap sums to 1)
            out[s : s + win] += shaped[fi]
        return out[:n]

    def _synth(self, n: int):
        """Full synthesis for item `n` -> (x, f0_base, segs, clean) where
        `clean` is the pre-room-noise signal under the SAME normalization as
        `x` (identical rng stream and arithmetic as always — cached corpora
        and goldens are unchanged)."""
        rng = np.random.default_rng(self.seed * 100003 + 7919 * n + 1)
        N = self.length
        f0_base = rng.uniform(85, 240)
        scale = rng.uniform(0.88, 1.18)  # vocal-tract length factor

        segs = self._segments(rng)
        voiced = self._voiced_source(rng, N, f0_base)
        noise = rng.normal(0, 1.0, N)
        noise = np.diff(noise, prepend=0.0)  # highpass for frication
        src = np.zeros(N)
        env = np.zeros(N)
        for s, e, kind in segs:
            seg_t = np.linspace(0, 1, e - s)
            attack = np.minimum(seg_t / 0.15, 1.0) * np.minimum(
                (1 - seg_t) / 0.25, 1.0
            )
            if kind == 0:
                src[s:e] = voiced[s:e] * 3.0
                env[s:e] = attack
            elif kind == 1:
                src[s:e] = noise[s:e] * 0.12
                env[s:e] = attack * rng.uniform(0.4, 0.8)
        clean = self._formant_filter(rng, src * env, segs, scale)
        x = clean + rng.normal(0, 0.0015, N)  # room noise floor
        denom = np.abs(x).max() + 1e-6
        clean = (clean / denom * 0.7).astype(np.float32)
        x = (x / denom * 0.7).astype(np.float32)
        return x, f0_base, segs, clean

    def __getitem__(self, n: int) -> Tuple[np.ndarray, int, Dict[str, str]]:
        if self._cache is not None and n in self._cache:
            return self._cache[n], self.sample_rate, {"kind": "pseudo_speech"}
        x, f0_base, _, _ = self._synth(n)
        if self._cache is not None:
            self._cache[n] = x[None, :]
        return (x[None, :], self.sample_rate,
                {"f0": f"{f0_base:.1f}", "kind": "pseudo_speech"})

    def item_diagnostics(self, n: int) -> Dict[str, np.ndarray]:
        """Ground truth the synthesizer knows but a codec cannot: per-sample
        voicing kind and the clean (no room-noise) signal.

        Returns {"x": item waveform, "clean": x minus the additive room
        noise floor (same normalization), "mask": int8 per sample — 0 voiced,
        1 unvoiced (stochastic frication: shaped white noise), 2 pause}.

        Why: waveform-matching metrics (SI-SDR/SNR) are FLOORED on this data
        for any codec that does not transmit the literal noise waveform —
        the unvoiced syllables (~25% of time) and the room floor are fresh
        i.i.d. draws per item. Masked SI-SDR over voiced samples and the
        clean-signal oracle bound (SI-SDR of `clean` as an estimate of `x`)
        are the honest references; tools/diag_pseudospeech.py reports both.
        """
        x, _, segs, clean = self._synth(n)
        mask = np.full(self.length, 2, dtype=np.int8)
        for s, e, kind in segs:
            mask[s:e] = kind
        return {"x": x, "clean": clean, "mask": mask}


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
    if name == "synthetic_speech":
        sr = kwargs.pop("sample_rate", 24000)
        return PseudoSpeech(sample_rate=sr, **kwargs), sr
    raise ValueError(f"Dataset {name!r} not recognised")
