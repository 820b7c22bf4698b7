"""Waveform plotting helpers (reference: networks/utils.py:107-135 and
save_samples at networks/training.py:81-88). matplotlib is optional."""
from __future__ import annotations

from typing import Optional

import numpy as np


def plot_waveform(
    waveform,
    sample_rate: int,
    save_path: Optional[str] = None,
    ax=None,
    return_ax: bool = False,
    alpha: float = 1.0,
    color: str = "blue",
):
    """Plot (channels, frames) or (frames,) waveform; supports overlaying on
    an existing axis (the real-vs-fake overlay pattern)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    waveform = np.asarray(waveform)
    if waveform.ndim == 1:
        waveform = waveform[None, :]
    num_frames = waveform.shape[-1]
    time_axis = np.arange(num_frames) / sample_rate
    if ax is None:
        figure, ax = plt.subplots(1, 1)
    else:
        figure = ax.figure
    ax.plot(time_axis, waveform[0], linewidth=1, alpha=alpha, color=color)
    ax.grid(True)
    figure.suptitle("waveform")
    if save_path is not None:
        figure.savefig(save_path)
        plt.close(figure)
    if return_ax:
        return ax


def save_samples(real, fake, epoch: int, i: int, path: str, sample_rate: int = 16000):
    """Real-vs-fake overlay PNG (reference: networks/training.py:81-88)."""
    import os

    name = os.path.join(path, f"sample_{epoch}_{i}.png")
    real = np.asarray(real)
    fake = np.asarray(fake)
    ax = plot_waveform(real, sample_rate, None, return_ax=True, alpha=0.3)
    plot_waveform(fake, sample_rate, name, ax=ax, color="red", alpha=0.3)
    return name
