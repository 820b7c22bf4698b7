"""Small host-side helpers (reference: networks/utils.py).

These are pure-Python/numpy utilities used by the trainer and tools; nothing
here is traced by JAX.
"""
from __future__ import annotations

import os

import numpy as np


def tuple_checker(item, length):
    """Broadcast a scalar to a list of `length`, or validate an iterable's length.

    Behavioral parity with the helper used throughout the reference
    (networks/utils.py:212-220, imported by networks/vae.py:6).
    """
    if isinstance(item, (int, float, str, bool)):
        return [item] * length
    if isinstance(item, (tuple, list)):
        if len(item) != length:
            raise ValueError(f"Expected sequence of length {length}, got {len(item)}")
        return list(item)
    return item


def approximate_square_root(x: int) -> tuple[int, int]:
    """Factor `x` into two near-square factors (a, b) with a*b == x.

    Used to lay a codebook out on a 2-D SOM grid
    (reference: networks/utils.py:13-26, which uses sympy.factorint; this is a
    dependency-free equivalent via trial division).
    """
    factors = []
    n = x
    d = 2
    while d * d <= n:
        while n % d == 0:
            factors.append(d)
            n //= d
        d += 1
    if n > 1:
        factors.append(n)
    a, b = 1, 1
    for f in sorted(factors):
        if a <= b:
            a *= f
        else:
            b *= f
    return a, b


def np_softmax(values) -> np.ndarray:
    """Numerically-stable softmax over a 1-D list/array
    (reference: networks/utils.py:28-32; used to sample one discriminator
    per mini-epoch at networks/training.py:280-283). The reference shifts by
    the *minimum*, which overflows exp() for wide loss ranges (early GAN
    training); shifting by the maximum is the standard stable form."""
    arr = np.asarray(values, dtype=np.float64)
    arr = np.where(np.isfinite(arr), arr, np.nanmax(arr[np.isfinite(arr)]) if np.isfinite(arr).any() else 0.0)
    arr = arr - arr.max()
    e = np.exp(arr)
    return e / e.sum()


def dist_to_uniform(step, rate=0.002, initial_dist=(1, 1, 1, 1)):
    """Anneal a distribution toward uniform as steps pass
    (reference: networks/utils.py:183-187)."""
    initial_dist = list(initial_dist)
    mean = sum(initial_dist) / len(initial_dist)
    return [v - (v - mean) * step * rate for v in initial_dist]


def interpolate_lists(list1, list2):
    """Return t ↦ t*list1 + (1-t)*list2 (reference: networks/utils.py:189-191)."""
    return lambda t: [t * i + (1 - t) * j for i, j in zip(list1, list2)]


def losses_to_running_loss(losses, alpha=0.95):
    """EWMA smoothing of a loss trace (reference: networks/utils.py:193-199)."""
    running_losses = []
    running = losses[0]
    for loss in losses:
        running = (1 - alpha) * loss + alpha * running
        running_losses.append(running)
    return running_losses


def get_latest_file(path, name):
    """Newest file under `path` whose basename contains `name`, by mtime;
    None if none exist (reference: networks/utils.py:201-210). Used for
    checkpoint auto-resume."""
    try:
        files = [
            os.path.join(path, f) for f in os.listdir(path) if name in f
        ]
        if not files:
            return None
        return max(files, key=os.path.getmtime)
    except (FileNotFoundError, ValueError):
        return None


def bitrate_calculator(stride_factor=320, sample_rate=24000, target_bitrate=6000):
    """Print (num_quantizers, codebook size) combos hitting a target bitrate
    (reference: networks/utils.py:137-147). Returns the table as a dict too."""
    fps = sample_rate / stride_factor
    bpf = target_bitrate / fps
    table = {}
    print(
        f"To have a bitrate of {target_bitrate} bps, with a stride factor of "
        f"{stride_factor} and a sample rate of {sample_rate}, the codebook "
        f"sizes should be as follows:"
    )
    for nq in range(4, 17):
        size = round(2 ** (bpf / nq))
        table[nq] = size
        print(f"\tNum quantizers = {nq} -> {size} num codebook entries")
    return table


def print_stale_clusters(in_clusters, out_clusters):
    """Pretty-print per-quantizer stale (unused) codebook entry deltas
    (reference: networks/utils.py:176-181)."""
    for i, (a, b) in enumerate(zip(in_clusters, out_clusters)):
        print(f"\tQuantizer {i} stale cluster change : {a} -> {b}")
