"""Codebook-usage visualization (reference: networks/utils.py:238-296).

`sound_to_codebooks` maps a waveform to per-frame SOM-grid heatmaps of
codebook usage; `animate_sound` renders them to an mp4 muxed with the
reconstructed audio (requires matplotlib + ffmpeg; both optional — the
heatmap tensor itself is always available for tests/tools).
"""
from __future__ import annotations

import os
import subprocess
from typing import Optional

import jax.numpy as jnp
import numpy as np

from audio_generation_tpu.utils.misc import approximate_square_root


def sound_to_codebooks(sound, model, variables) -> np.ndarray:
    """sound: (B, ...) model-layout waveform -> (frames, H, W) heatmaps where
    each frame marks the SOM-grid cells used by each quantizer level
    (levels colored by reverse index, reference: utils.py:238-259)."""
    q = model.quantizer
    h, w = q.som_grid if model.use_som else approximate_square_root(q.codebook_sizes[0])
    (_zq, _commit, indices), _ = model.apply(
        variables, sound, method="encode", mutable=["codebook"]
    )
    idx = np.asarray(indices)[0]  # (L, nq)
    L, nq = idx.shape
    size = q.codebook_sizes[0]
    one_hot = np.zeros((L, nq, size), dtype=np.float32)
    for qi in range(nq):
        lv = np.clip(idx[:, qi], 0, size - 1)
        one_hot[np.arange(L), qi, lv] = nq - qi  # unique color per level
    grid = one_hot.reshape(L, nq, h, w).sum(axis=1)
    return grid


def animate_sound(
    sound,
    model,
    variables,
    rate: int = 16000,
    slowdown: float = 1.0,
    out_path: str = "audio_codebook.mp4",
    tmp_dir: str = ".",
) -> Optional[str]:
    """Render the codebook-usage animation muxed with reconstructed audio
    (reference: utils.py:261-296). Returns the output path, or None if
    matplotlib/ffmpeg are unavailable."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from matplotlib import animation
    except Exception:
        return None

    from audio_generation_tpu.data.wavio import write_wav

    codebooks = sound_to_codebooks(sound, model, variables)
    n_samples = np.asarray(sound).shape[-1]
    time_len = n_samples * slowdown / rate
    time_per_frame = time_len / codebooks.shape[0]

    fig, ax = plt.subplots()
    cax = ax.pcolormesh(codebooks[0], cmap="viridis")

    def animate(i):
        cax.set_array(codebooks[i])

    anim = animation.FuncAnimation(
        fig, animate, interval=1000 * time_per_frame, frames=codebooks.shape[0]
    )
    video_tmp = os.path.join(tmp_dir, "temp_codebook.mp4")
    audio_tmp = os.path.join(tmp_dir, "temp_codebook.wav")
    try:
        anim.save(video_tmp)
    except Exception:
        # no ffmpeg in this image: fall back to an animated GIF (Pillow
        # writer) + the reconstruction wav saved alongside (GIF has no audio
        # track to mux). Reference behavior (mp4 mux) kept when ffmpeg exists.
        try:
            fps = max(1.0 / max(time_per_frame, 1e-6), 1.0)
            gif_path = os.path.splitext(out_path)[0] + ".gif"
            anim.save(gif_path, writer=animation.PillowWriter(fps=min(fps, 30.0)))
            plt.close(fig)
            (recons, _, _), _ = model.apply(variables, sound, mutable=["codebook"])
            wav_path = os.path.splitext(out_path)[0] + ".wav"
            write_wav(wav_path, np.asarray(recons)[0], int(rate / slowdown))
            return gif_path
        except Exception:
            plt.close(fig)
            return None
    plt.close(fig)

    (recons, _, _), _ = model.apply(variables, sound, mutable=["codebook"])
    write_wav(audio_tmp, np.asarray(recons)[0], int(rate / slowdown))

    if os.path.exists(out_path):
        os.remove(out_path)
    try:
        subprocess.run(
            ["ffmpeg", "-y", "-i", video_tmp, "-i", audio_tmp, out_path],
            check=True,
            capture_output=True,
        )
    except (subprocess.CalledProcessError, FileNotFoundError):
        return video_tmp  # no ffmpeg: leave the silent video
    finally:
        for f in [audio_tmp]:
            if os.path.exists(f):
                os.remove(f)
    os.remove(video_tmp)
    return out_path
