"""SWAP_r03 — demonstrate `Trainer.train_new_quantizer` on a TRAINED codec.

The reference's bottleneck-swap workflow (networks/training.py:502-523 +
networks/vae.py:347-348: keep the trained encoder/decoder, re-initialize the
bottleneck, retrain with slow codec LRs) has unit tests here
(tests/test_trainer.py:172) but had never been run on a real trained
checkpoint. This tool:

  1. copies the QUALITY_r03 `rvq8_gan_hifi` run dir (so the campaign's
     checkpoints are never touched) and resumes the full GAN train state,
  2. evaluates the trained RVQ codec on the held-out batch,
  3. swaps RVQ -> energy-transformer bottleneck via train_new_quantizer
     (slow 1e-6 enc/dec LR, full LR for the new bottleneck) and trains a few
     epochs with in-loop eval every epoch,
  4. writes SWAP_r03.json: pre-swap metrics, post-swap step-0 metrics, the
     post-swap recovery trajectory, and the scratch-energy comparison points
     (QUALITY_r03 energy_hifi trajectory at matched step counts).

Usage (TPU, after the quality campaign has released the chip):
  python tools/swap_r03.py [--epochs N] [--src rvq8_gan_hifi]
"""
from __future__ import annotations

import argparse
import csv
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT_DIR = "QUALITY_r03"


def scratch_energy_points(max_step: int):
    """(step, si_sdr) points from the scratch energy_hifi in-loop trajectory,
    for matched-step comparison (carried over in trajectories.bak.md if the
    run dir was lost)."""
    path = os.path.join(OUT_DIR, "runs", "energy_hifi", "metrics.csv")
    pts = []
    if os.path.exists(path):
        with open(path) as f:
            for row in csv.DictReader(f):
                if row.get("eval_si_sdr_db"):
                    pts.append((int(float(row["step"])), float(row["eval_si_sdr_db"])))
    return [p for p in pts if p[0] <= max_step * 1.5]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--src", default="rvq8_gan_hifi")
    ap.add_argument("--workdir", default="/tmp/swap_runs")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU check: fresh tiny GAN trainer, no resume")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from quality_r03 import CONFIGS, SR, eval_batch

    from audio_generation_tpu.config import ExperimentConfig
    from audio_generation_tpu.evaluate import evaluate_codec
    from audio_generation_tpu.train.trainer import Trainer

    spec = json.loads(json.dumps(CONFIGS[args.src]))
    spec["vae_args"]["compute_dtype"] = "bfloat16"
    spec["trainer_args"]["eval_every"] = 0  # this tool evals explicitly
    if args.smoke:
        spec["vae_args"]["first_block_channels"] = 8
        spec["trainer_args"].update(
            batch_size=2, mini_epoch_length=4, crop_size=6144)
        spec["discriminator_bank"] = "small"

    if not args.smoke:
        src_dir = os.path.join(OUT_DIR, "runs", args.src)
        if not os.path.isdir(src_dir):
            sys.exit(f"no trained run dir at {src_dir}")
        dst_dir = os.path.join(args.workdir, args.src)
        if os.path.isdir(dst_dir):
            shutil.rmtree(dst_dir)
        os.makedirs(args.workdir, exist_ok=True)
        shutil.copytree(src_dir, dst_dir)

    cfg = ExperimentConfig.from_dict(
        {
            "experiment_name": args.src,
            "dataset": "synthetic",
            "sample_rate": SR,
            "scratch_train": bool(args.smoke),
            "save_path_root": args.workdir + "/",
            **spec,
        }
    )
    trainer = Trainer(cfg)
    resumed_step = int(trainer.state.step)
    waves = eval_batch(n=4 if args.smoke else 16)
    if args.smoke:
        waves = waves[:, : trainer.crop_size]

    pre = evaluate_codec(trainer.model, trainer._variables(), waves, SR)
    print(f"[swap] resumed step {resumed_step}; pre-swap (trained RVQ): "
          f"{ {k: round(float(v), 3) for k, v in pre.items()} }", flush=True)

    t0 = time.time()
    trainer.train_new_quantizer(
        bottleneck="energy",
        slow_lr=1e-6,
        energy_kwargs={"n_iters": 8},
        epochs=0,  # swap only; we drive epochs ourselves for per-epoch eval
    )
    post0 = evaluate_codec(trainer.model, trainer._variables(), waves, SR)
    print(f"[swap] post-swap step-0 (fresh energy bottleneck): "
          f"{ {k: round(float(v), 3) for k, v in post0.items()} }", flush=True)

    # drive mini_epoch directly: trainer.train() checkpoints the FULL state
    # through the tunnel at every call end (~minutes each) which would
    # dominate this short demo
    traj = []
    data_iter = trainer._data_iterator(shuffle=True)
    for ep in range(args.epochs):
        te = time.time()
        # mini_epoch never raises StopIteration (next(it, None) + break); an
        # exhausted iterator = 0 steps advanced — refresh and retry, so every
        # recorded recovery point reflects real training (the first SWAP_r03
        # run recorded flat duplicate points 2-4 from exactly this)
        ep_step0 = int(trainer.state.step)
        trainer.mini_epoch(data_iter)
        if int(trainer.state.step) == ep_step0:
            data_iter = trainer._data_iterator(shuffle=True)
            trainer.mini_epoch(data_iter)
        m = evaluate_codec(trainer.model, trainer._variables(), waves, SR)
        steps = int(trainer.state.step) - resumed_step
        traj.append({"swap_steps": steps,
                     **{k: round(float(v), 4) for k, v in m.items()},
                     "epoch_wall_s": round(time.time() - te, 1)})
        print(f"[swap] +{steps} steps: si_sdr {m['si_sdr_db']:+.2f} dB "
              f"({time.time() - te:.0f}s)", flush=True)

    out = {
        "src": args.src,
        "resumed_step": resumed_step,
        "swap": "rvq -> energy (n_iters 8), slow_lr 1e-6, full model_lr bottleneck",
        "pre_swap": {k: round(float(v), 4) for k, v in pre.items()},
        "post_swap_step0": {k: round(float(v), 4) for k, v in post0.items()},
        "recovery": traj,
        "scratch_energy_reference_points": scratch_energy_points(
            traj[-1]["swap_steps"] if traj else 0
        ),
        "wall_s": round(time.time() - t0, 1),
    }
    path = "/tmp/SWAP_smoke.json" if args.smoke else "SWAP_r03.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
