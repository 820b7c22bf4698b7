"""Round-3 pre-campaign ablation (VERDICT.md tasks 1+2, config selection).

Short matched-step no-GAN runs on the TPU that settle two questions before
the long flagship training campaign:

  1. does bf16 compute close the convergence gap seen at 48 steps in
     BF16_TRAIN_r02.json once runs reach hundreds of steps?
  2. how much does waveform-loss weighting (reference's
     reconstruction_loss_weight=100 + the new raw_reconstruction_weight)
     move SI-SDR, which plateaued at -30 dB in round 2 because pre-emphasis
     removes 19 dB of the synthetic data's power before the only
     phase-sensitive loss (tools/diag_sisdr.py)?

Writes CONVERGE_r03.json. Usage: python tools/convergence_r03.py [names...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = "CONVERGE_r03.json"
SR, CROP = 24000, 36000
EPOCHS = 20  # x 31 steps/epoch (248 train items / batch 8) = 620 steps

VARIANTS = {
    # name: (compute_dtype, reconstruction_loss_weight, raw_reconstruction_weight)
    "f32_w10_raw0": ("float32", 10.0, 0.0),     # round-2 configuration
    "f32_w100_raw30": ("float32", 100.0, 30.0),
    "f32_w100_raw100": ("float32", 100.0, 100.0),
    "bf16_w100_raw30": ("bfloat16", 100.0, 30.0),
}


def run(name):
    from audio_generation_tpu.config import ExperimentConfig
    from audio_generation_tpu.train.trainer import Trainer

    dtype, w, raw = VARIANTS[name]
    cfg = ExperimentConfig.from_dict(
        {
            "experiment_name": f"conv_{name}",
            "dataset": "synthetic",
            "sample_rate": SR,
            "scratch_train": True,
            "save_path_root": "/tmp/converge_r03/",
            "use_discriminator": False,
            "vae_args": {"num_quantizers": 8, "compute_dtype": dtype},
            "trainer_args": {
                "batch_size": 8, "accumulation_steps": 1,
                "mini_epoch_length": 32, "crop_size": CROP,
                "reconstruction_loss_weight": w,
                "raw_reconstruction_weight": raw,
                "eval_every": 4,
            },
            "train_run_args": {"epochs": EPOCHS, "gan_loss": False},
        }
    )
    t0 = time.time()
    tr = Trainer(cfg)
    losses = tr.train()
    ev = tr.evaluate()
    wall = time.time() - t0
    res = {
        "name": name, "dtype": dtype, "recon_w": w, "raw_w": raw,
        "steps": int(tr.state.step), "wall_s": round(wall, 1),
        "loss_first16": float(np.mean(losses[:16])),
        "loss_last16": float(np.mean(losses[-16:])),
        **{k: round(float(v), 3) for k, v in (ev or {}).items()},
    }
    print(json.dumps(res), flush=True)
    return res


def main():
    names = sys.argv[1:] or list(VARIANTS)
    results = []
    if os.path.exists(OUT):
        results = json.load(open(OUT)).get("variants", [])
        done = {r["name"] for r in results}
        names = [n for n in names if n not in done]
    for n in names:
        results.append(run(n))
        with open(OUT, "w") as f:
            json.dump({"note": "620-step no-GAN convergence/SI-SDR ablation, "
                               "TPU v5e, batch 8 x 36000 crops @ 24 kHz",
                       "variants": results}, f, indent=1)


if __name__ == "__main__":
    main()
