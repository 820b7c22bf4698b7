"""bf16 vs f32 full-GAN training step: wall-clock + loss-trend comparison.

Builds the flagship GAN trainer twice (compute_dtype float32 / bfloat16,
identical seeds), pins ONE discriminator (so each dtype costs exactly one
step compile), runs `n_steps` optimizer steps on synthetic data, and reports
compile time, steady-state p50 step time, and the loss trajectory. Writes
BF16_TRAIN_r02.json at the repo root.

Usage: python tools/bench_train.py [n_steps] [disc_index]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(dtype: str, n_steps: int, disc_index: int):
    import jax
    import jax.numpy as jnp

    from audio_generation_tpu.config import ExperimentConfig
    from audio_generation_tpu.train.trainer import Trainer

    cfg = ExperimentConfig.from_dict(
        {
            "experiment_name": f"bf16cmp_{dtype}",
            "dataset": "synthetic",
            "sample_rate": 24000,
            "use_discriminator": True,
            "scratch_train": True,
            "save_path_root": "/tmp/bf16cmp/",
            "vae_args": {"compute_dtype": dtype},
            "trainer_args": {
                "batch_size": 2, "accumulation_steps": 2, "crop_size": 36000,
                "use_one_discriminator": True, "save_every": 10_000,
            },
        }
    )
    trainer = Trainer(cfg)
    active = (disc_index,)
    step_fn = trainer.steps.build(active)
    codebook_n = jnp.asarray(8, jnp.int32)
    data_iter = trainer._data_iterator()

    state = trainer.state
    t0 = time.time()
    state, metrics, _ = step_fn(state, next(data_iter), codebook_n)
    metrics = jax.device_get(metrics)
    compile_s = time.time() - t0

    losses, times = [float(metrics["generator_total"])], []
    for _ in range(n_steps - 1):
        batch = next(data_iter, None)
        if batch is None:
            data_iter = trainer._data_iterator()
            batch = next(data_iter)
        t0 = time.time()
        state, metrics, _ = step_fn(state, batch, codebook_n)
        metrics = jax.device_get(metrics)  # forces completion
        times.append(time.time() - t0)
        losses.append(float(metrics["generator_total"]))

    return {
        "dtype": dtype,
        "discriminator": trainer.disc_names[disc_index],
        "opt_steps": len(losses),
        "compile_plus_first_step_s": round(compile_s, 1),
        "p50_step_s": round(float(np.percentile(times, 50)), 3),
        "train_realtime_x": round(
            2 * 2 * 1.5 / float(np.percentile(times, 50)), 1
        ),
        "loss_first8": round(float(np.mean(losses[:8])), 3),
        "loss_last8": round(float(np.mean(losses[-8:])), 3),
        "loss_finite": bool(np.isfinite(losses).all()),
    }


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    disc = int(sys.argv[2]) if len(sys.argv) > 2 else 2  # stft_1024
    out = {}
    for dtype in ["float32", "bfloat16"]:
        print(f"=== {dtype} ===", flush=True)
        out[dtype] = run(dtype, n_steps, disc)
        print(json.dumps(out[dtype]), flush=True)
    out["bf16_step_speedup"] = round(
        out["float32"]["p50_step_s"] / out["bfloat16"]["p50_step_s"], 3
    )
    with open("BF16_TRAIN_r02.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
