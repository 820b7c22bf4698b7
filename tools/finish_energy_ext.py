"""Finish the orphaned energy_fm50_ext90 extension from its last checkpoint.

The round-4 replay queue's `energy_ganft.py extend ganft_energy_fm50 90` was
SIGTERMed by its inherited 7200 s timeout ~4 minutes before its own deadline
— after 10 full epochs (last in-loop eval: SI-SDR +7.39 dB / mel 0.70 /
MCD 26.1 / STOI* 0.949 — the energy GAN branch crossed the phase floor) but
BEFORE the final held-out eval + npz snapshot + sweep json were written. The
Orbax checkpoint at step 5110 survived in the /tmp run dir.

This tool rebuilds the identical trainer, restores that checkpoint, runs the
standard held-out eval (same q.eval_batch protocol as every sweep row),
saves the committed npz snapshot, and writes the sweep row with the honest
step count/minutes. Run on the TPU (serial, inside the queue).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import energy_ganft as eg
import ganft_sweep as gs
import quality_r04 as q

OUT_TAG = "energy_fm50_ext90"
TRAIN_MINUTES = 77.0  # wall-clock actually trained before the SIGTERM
# (11:53 first step .. 13:49 kill, minus ~10 min of setup/compile; the
# planned budget was 90 — recorded honestly as ~77)


def main():
    import jax

    from audio_generation_tpu.evaluate import evaluate_codec
    from audio_generation_tpu.train.checkpoint import save_params_npz

    out_p = os.path.join(gs.SWEEP_DIR, f"{OUT_TAG}.json")
    if os.path.exists(out_p):
        print(f"[{OUT_TAG}] exists — skipping")
        return

    trainer = eg.make_trainer(fm=50.0)
    ck_dir = os.path.join(trainer.workdir, "checkpoints")
    if not os.path.isdir(ck_dir) or not os.listdir(ck_dir):
        # the /tmp run dir was reset — fall back to the rescue copy
        rescue = "/tmp/energy_ext_rescue_5110"
        if os.path.isdir(rescue):
            os.makedirs(ck_dir, exist_ok=True)
            import shutil

            shutil.copytree(rescue, os.path.join(ck_dir, "5110"))
        else:
            sys.exit("no checkpoint to finish from")
    restored = trainer.ckpt.restore_latest(trainer.state)
    if restored is None:
        sys.exit("checkpoint restore failed")
    state, _meta, step = restored
    trainer.state = state
    step = int(step)
    if step == 0:
        sys.exit("restored step 0 — refusing to evaluate an untrained state")
    print(f"[{OUT_TAG}] restored step {step} from {ck_dir}")

    waves = q.eval_batch()
    after = evaluate_codec(trainer.model, trainer._variables(), waves, q.SR)

    snap_p = os.path.join(q.SNAP_DIR, f"ganft_{OUT_TAG}.npz")
    size = save_params_npz(
        snap_p,
        jax.device_get(trainer.state.params),
        jax.device_get(trainer.state.codebook),
        {"config": f"ganft_{OUT_TAG}", "step": step,
         "dtype": str(trainer.model.compute_dtype),
         "sample_rate": q.SR},
        params_dtype="float16",
    )
    result = {
        "tag": OUT_TAG,
        "feature_multiplier": 50.0,
        "lr": {"model": 2e-4, "discriminator": 2e-4},
        "adversary": "stft_discriminator_1024 (single, full-size)",
        "donor": "ganft_energy_fm50",
        "seed": 0,
        "donor_step": 511,
        "steps": step,
        "train_minutes": TRAIN_MINUTES,
        "note": "finished from the step-5110 checkpoint after the round-4 "
                "replay queue's 7200 s timeout SIGTERMed the run ~4 min "
                "early (tools/finish_energy_ext.py); planned budget 90 min",
        "after": {k: round(float(v), 4) for k, v in after.items()},
        "snapshot": snap_p,
    }
    os.makedirs(gs.SWEEP_DIR, exist_ok=True)
    with open(out_p, "w") as f:
        json.dump(result, f, indent=1)
    csv_src = os.path.join(trainer.workdir, "metrics.csv")
    if os.path.exists(csv_src):
        import shutil

        shutil.copy(csv_src, os.path.join(gs.SWEEP_DIR, f"{OUT_TAG}.metrics.csv"))
    print(json.dumps(result), flush=True)
    print(f"[{OUT_TAG}] snapshot -> {snap_p} ({size/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
