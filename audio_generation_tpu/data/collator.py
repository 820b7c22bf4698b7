"""Batch collation: pad-or-crop to a fixed length (static shapes for XLA).

Reference: networks/utils.py:149-174 — short clips are zero-padded with a
random front/back split; long clips are cropped at a random offset; optional
resampling. Pure numpy on the host (the TPU sees only fixed (B, L) arrays).
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from audio_generation_tpu.ops.signal import resample


def collate(
    batch: Sequence[np.ndarray],
    size: int = 72000,
    rng: Optional[np.random.Generator] = None,
    resample_from: Optional[int] = None,
    resample_to: Optional[int] = None,
) -> np.ndarray:
    """batch: list of (channels, length) or (length,) arrays -> (B, size) mono.

    Multichannel inputs are averaged to mono (the reference datasets are mono;
    its vae demo averages channels, networks/vae.py:378).
    """
    if rng is None:
        rng = np.random.default_rng()
    out = np.zeros((len(batch), size), dtype=np.float32)
    for bi, x in enumerate(batch):
        x = np.asarray(x, dtype=np.float32)
        if x.ndim == 2:
            x = x.mean(axis=0)
        if resample_from and resample_to and resample_from != resample_to:
            x = resample(x[None], resample_from, resample_to)[0]
        n = x.shape[-1]
        if n < size:
            diff = size - n
            split = int(rng.integers(0, diff)) if diff > 0 else 0
            out[bi, split : split + n] = x
        elif n > size:
            start = int(rng.integers(0, n - size))
            out[bi] = x[start : start + size]
        else:
            out[bi] = x
    return out
