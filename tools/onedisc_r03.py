"""ONEDISC_r03 — test the reference's one-sampled-discriminator speed claim.

Reference README.md:58: switching from updating ALL discriminators every
mini-epoch to softmax-sampling ONE by running energy "significantly improved
speed without harming quality" (mechanism: networks/training.py:276-294).
Round 3's GAN campaign ran the one-sampled mode; this tool measures the
claim's SPEED half head-to-head and spot-checks the quality half at a short
matched-step horizon:

  full_bank    use_one_discriminator=False — all 6 discriminators (1 waveform
               + 5 STFT) forward/backward + updated in every optimizer step
  one_sampled  use_one_discriminator=True — one energy-sampled discriminator
               per mini-epoch (codebook_n tied to the sampled identity)

Both modes run the same config as QUALITY_r03 (batch 8 x 36000 crops, bf16,
w100 + raw100 + clip10), the same seed (identical data streams), and the same
number of optimizer steps. Timing drives Trainer.mini_epoch directly (no
checkpoint saves, no eval epochs); per-mini-epoch wall times are tagged with
the active-discriminator tuple so compile-containing calls (first occurrence
of a tuple) are excluded from the steady-state p50. evaluate_codec runs on
the QUALITY_r03 held-out batch before/after.

Writes ONEDISC_r03.json. Usage:
  python tools/onedisc_r03.py [--mini-epochs N] [--dtype bfloat16]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SR, CROP = 24000, 36000
SMOKE = False  # --smoke: tiny shapes + small discriminator bank (CPU check)


def build_trainer(one_sampled: bool, dtype: str, workdir: str):
    from audio_generation_tpu.config import ExperimentConfig
    from audio_generation_tpu.train.trainer import Trainer

    cfg = ExperimentConfig.from_dict(
        {
            "experiment_name": f"onedisc_{'one' if one_sampled else 'full'}",
            "dataset": "synthetic",
            "sample_rate": SR,
            "scratch_train": True,
            "save_path_root": workdir + "/",
            "use_discriminator": True,
            "discriminator_bank": "small" if SMOKE else "full",
            "vae_args": {"num_quantizers": 8, "compute_dtype": dtype},
            "trainer_args": {
                "batch_size": 2 if SMOKE else 8,
                "accumulation_steps": 1,
                "mini_epoch_length": 4 if SMOKE else 32,
                "crop_size": 6144 if SMOKE else CROP,  # small-bank VALID stack needs >= ~6k
                "reconstruction_loss_weight": 100.0,
                "raw_reconstruction_weight": 100.0,
                "grad_clip_norm": 10.0,
                "use_one_discriminator": one_sampled,
                "eval_every": 0,
            },
        }
    )
    return Trainer(cfg)


def run_mode(one_sampled: bool, n_mini_epochs: int, dtype: str, waves):
    from audio_generation_tpu.evaluate import evaluate_codec

    name = "one_sampled" if one_sampled else "full_bank"
    trainer = build_trainer(one_sampled, dtype, f"/tmp/onedisc_{name}")
    before = evaluate_codec(trainer.model, trainer._variables(), waves, SR)

    records = []  # (wall_s, steps, active, first_time_for_active)
    seen: set = set()
    data_iter = trainer._data_iterator(shuffle=True)
    for mi in range(n_mini_epochs):
        step0 = int(trainer.state.step)
        t0 = time.time()
        # mini_epoch never raises StopIteration (it uses next(it, None) and
        # just stops); an exhausted iterator shows up as 0 steps advanced —
        # refresh and RETRY the same mini-epoch
        trainer.mini_epoch(data_iter)
        if int(trainer.state.step) == step0:
            data_iter = trainer._data_iterator(shuffle=True)
            trainer.mini_epoch(data_iter)
        wall = time.time() - t0
        steps = int(trainer.state.step) - step0
        if steps == 0:
            continue
        # Trainer doesn't expose the sampled tuple; infer compile calls from
        # the step-fn cache size growing during this mini-epoch instead.
        n_compiled = len(trainer.steps._step_cache)
        fresh = n_compiled > len(seen)
        seen = set(range(n_compiled))
        records.append({"wall_s": wall, "steps": steps, "fresh_compile": fresh})
        print(
            f"[{name}] mini-epoch {mi}: {steps} steps in {wall:.1f}s"
            f"{' (compile)' if fresh else ''}",
            flush=True,
        )

    after = evaluate_codec(trainer.model, trainer._variables(), waves, SR)
    steady = [r["wall_s"] / r["steps"] for r in records if not r["fresh_compile"]]
    compile_walls = [r["wall_s"] for r in records if r["fresh_compile"]]
    total_steps = sum(r["steps"] for r in records)
    return {
        "mode": name,
        "total_steps": total_steps,
        "n_step_fn_variants_compiled": len(seen),
        "compile_mini_epoch_walls_s": [round(w, 1) for w in compile_walls],
        "steady_s_per_step_p50": round(float(np.median(steady)), 4) if steady else None,
        "steady_s_per_step_mean": round(float(np.mean(steady)), 4) if steady else None,
        "before": {k: round(float(v), 4) for k, v in before.items()},
        "after": {k: round(float(v), 4) for k, v in after.items()},
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mini-epochs", type=int, default=30)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes + small discriminator bank (CPU check)")
    ap.add_argument("modes", nargs="*", default=None)
    args = ap.parse_args()
    global SMOKE
    SMOKE = args.smoke

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from quality_r03 import eval_batch

    waves = eval_batch(n=4 if SMOKE else 16)
    out = {"config": ("SMOKE (batch 2 x 4800, small bank)" if SMOKE else
                      "batch 8 x 36000 @ 24kHz, accum 1, w100+raw100+clip10"),
           "dtype": args.dtype, "mini_epochs": args.mini_epochs,
           "steps_per_mini_epoch": 4 if SMOKE else 32, "modes": []}
    out_path = "/tmp/ONEDISC_smoke.json" if SMOKE else "ONEDISC_r03.json"
    modes = args.modes or ["one_sampled", "full_bank"]
    for m in modes:
        out["modes"].append(
            run_mode(m == "one_sampled", args.mini_epochs, args.dtype, waves)
        )
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)
    by = {m["mode"]: m for m in out["modes"]}
    if "one_sampled" in by and "full_bank" in by:
        a, b = by["one_sampled"], by["full_bank"]
        if a["steady_s_per_step_p50"] and b["steady_s_per_step_p50"]:
            out["speedup_one_sampled_vs_full_bank"] = round(
                b["steady_s_per_step_p50"] / a["steady_s_per_step_p50"], 3
            )
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
