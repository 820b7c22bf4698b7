"""Reference-scale GAN step on one v5e: batch 4 x accum 32 x 72000-sample
crops (the reference's shipped config, config/training.yml:25 + 72000 crops
at utils.py:149-174) — the carry-accumulated grad scan must fit in 16 GB HBM
(round-1 stacked-accum would have kept 32 gradient copies resident).

Runs ONE full optimizer step (generator + one sampled discriminator) and
prints step metrics + timing. Writes REFSCALE_r02.json.

Usage: python tools/refscale_step.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from audio_generation_tpu.config import ExperimentConfig
    from audio_generation_tpu.train.trainer import Trainer

    cfg = ExperimentConfig.from_dict(
        {
            "experiment_name": "refscale",
            "dataset": "synthetic",
            "sample_rate": 24000,
            "use_discriminator": True,
            "scratch_train": True,
            "save_path_root": "/tmp/refscale/",
            "vae_args": {"remat_blocks": True},
            "trainer_args": {
                "batch_size": 4,
                "accumulation_steps": 32,
                "crop_size": 72000,
                "use_one_discriminator": True,
                "mini_epoch_length": 32,
                "remat_discriminators": True,
            },
            "train_run_args": {"epochs": 1},
        }
    )
    trainer = Trainer(cfg)
    rng = np.random.default_rng(0)
    batch = jnp.asarray(
        rng.normal(size=(32, 4, 72000)).astype(np.float32) * 0.1
    )
    active = (2,)  # one STFT discriminator
    step_fn = trainer.steps.build(active)

    t0 = time.time()
    state, metrics, _ = step_fn(trainer.state, batch, jnp.asarray(8, jnp.int32))
    metrics = jax.device_get(metrics)
    compile_and_first = time.time() - t0

    t0 = time.time()
    state, metrics, _ = step_fn(state, batch, jnp.asarray(8, jnp.int32))
    metrics = jax.device_get(metrics)
    second = time.time() - t0

    out = {
        "config": "batch 4 x accum 32 x 72000 (reference scale)",
        "active_discriminator": trainer.disc_names[2],
        "compile_plus_first_step_s": round(compile_and_first, 1),
        "steady_step_s": round(second, 2),
        "audio_s_per_step": 4 * 32 * 3.0,
        "train_realtime_factor": round(4 * 32 * 3.0 / second, 1),
        "metrics": {k: round(float(v), 4) for k, v in metrics.items()},
        "nan": bool(metrics.get("nan_flag", 0.0) > 0),
    }
    with open("REFSCALE_r02.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
