"""bf16 vs f32 full-GAN training step: wall-clock + loss-trend comparison.

Runs the flagship GAN trainer (one-sampled discriminator) on synthetic data
twice — compute_dtype float32 and bfloat16 — with identical seeds, and
reports per-step p50 time and first/last mean losses. Writes
BF16_TRAIN_r02.json at the repo root.

Usage: python tools/bench_train.py [n_epochs]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(dtype: str, epochs: int):
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
            # batch 2 x accum 2 x crop 36000: the round-1 TPU-validated
            # shapes, so f32 step compiles hit the persistent XLA cache
            "trainer_args": {
                "batch_size": 2, "accumulation_steps": 2, "crop_size": 36000,
                "use_one_discriminator": True, "mini_epoch_length": 16,
                "save_every": 10_000,
            },
            "train_run_args": {"epochs": epochs},
        }
    )
    trainer = Trainer(cfg)

    losses: list = []
    t0 = time.time()
    trainer.train(losses=losses)
    wall = time.time() - t0
    n = max(len(losses), 1)
    return {
        "dtype": dtype,
        "opt_steps": n,
        "wall_s": round(wall, 1),
        "s_per_step_incl_compile": round(wall / n, 3),
        "loss_first16": round(float(np.mean(losses[:16])), 3),
        "loss_last16": round(float(np.mean(losses[-16:])), 3),
        "loss_finite": bool(np.isfinite(losses).all()),
    }


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out = {}
    for dtype in ["float32", "bfloat16"]:
        print(f"=== {dtype} ===", flush=True)
        out[dtype] = run(dtype, epochs)
        print(json.dumps(out[dtype]), flush=True)
    out["speedup_bf16"] = round(
        out["float32"]["s_per_step_incl_compile"]
        / out["bfloat16"]["s_per_step_incl_compile"],
        3,
    )
    with open("BF16_TRAIN_r02.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
