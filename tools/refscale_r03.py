"""REFSCALE_r03: reference-scale GAN step in bf16 (VERDICT.md task 2).

Round 2 measured the batch 4 x accum 32 x 72000-crop step (the reference's
shipped config, config/training.yml:25) in f32 only: 23.65 s/step with remat
required (REFSCALE_r02.json). This measures the bf16 compute path at the same
scale and checks whether remat is still required at bf16's halved activation
footprint. Writes REFSCALE_r03.json.

Usage: python tools/refscale_r03.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

VARIANTS = [
    ("bf16_remat", "bfloat16", True),
    ("bf16_noremat", "bfloat16", False),
]


def run(tag, dtype, remat):
    import jax
    import jax.numpy as jnp

    from audio_generation_tpu.config import ExperimentConfig
    from audio_generation_tpu.train.trainer import Trainer

    cfg = ExperimentConfig.from_dict(
        {
            "experiment_name": f"refscale_{tag}",
            "dataset": "synthetic",
            "sample_rate": 24000,
            "use_discriminator": True,
            "scratch_train": True,
            "save_path_root": "/tmp/refscale_r03/",
            "vae_args": {"remat_blocks": remat, "compute_dtype": dtype},
            "trainer_args": {
                "batch_size": 4,
                "accumulation_steps": 32,
                "crop_size": 72000,
                "use_one_discriminator": True,
                "mini_epoch_length": 32,
                "remat_discriminators": remat,
            },
            "train_run_args": {"epochs": 1},
        }
    )
    trainer = Trainer(cfg)
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.normal(size=(32, 4, 72000)).astype(np.float32) * 0.1)
    active = (2,)  # one STFT discriminator (matches REFSCALE_r02)
    step_fn = trainer.steps.build(active)

    t0 = time.time()
    state, metrics, _ = step_fn(trainer.state, batch, jnp.asarray(8, jnp.int32))
    metrics = jax.device_get(metrics)
    compile_and_first = time.time() - t0

    times = []
    for _ in range(4):
        t0 = time.time()
        state, metrics, _ = step_fn(state, batch, jnp.asarray(8, jnp.int32))
        metrics = jax.device_get(metrics)
        times.append(time.time() - t0)
    p50 = float(np.percentile(times, 50))

    return {
        "variant": tag,
        "dtype": dtype,
        "remat": remat,
        "compile_plus_first_step_s": round(compile_and_first, 1),
        "step_p50_s": round(p50, 2),
        "audio_s_per_step": 4 * 32 * 3.0,
        "train_realtime_factor": round(4 * 32 * 3.0 / p50, 1),
        "generator_total": round(float(metrics["generator_total"]), 3),
        "nan": bool(metrics.get("nan_flag", 0.0) > 0),
    }


def main():
    rows = []
    if os.path.exists("REFSCALE_r03.json"):
        rows = json.load(open("REFSCALE_r03.json")).get("variants", [])
    done = {r["variant"] for r in rows}
    for tag, dtype, remat in VARIANTS:
        if tag in done:
            continue
        try:
            rows.append(run(tag, dtype, remat))
        except Exception as e:  # OOM at noremat is itself a finding
            msg = str(e)
            rows.append({"variant": tag, "dtype": dtype, "remat": remat,
                         "error": msg[:300],
                         "oom": "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg})
        with open("REFSCALE_r03.json", "w") as f:
            json.dump({
                "note": ("reference-scale GAN step (batch 4 x accum 32 x 72000 "
                         "crops @ 24 kHz, one STFT discriminator) in bf16; "
                         "f32+remat baseline = 23.65 s/step (REFSCALE_r02.json)"),
                "variants": rows,
            }, f, indent=1)
        print(json.dumps(rows[-1]), flush=True)


if __name__ == "__main__":
    main()
