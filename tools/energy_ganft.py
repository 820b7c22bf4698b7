"""GAN fine-tune of the ENERGY flagship (energy_rvq_speech) — the strongest
available test of the reference's adversarial claim (README.md:57-58).

Rationale: the round-4 campaign showed the rvq8 flagship is phase-floored on
PseudoSpeech (held-out SI-SDR ~-40 dB while mel/MCD converge — it codes the
spectral envelope, not instantaneous phase), so adversarial fine-tuning of
THAT donor adjudicates the GAN term on a model that cannot show a waveform
win.  energy_rvq_speech is NOT floored (+6.2 dB SI-SDR, STOI* 0.93 at 4 kbps
on the same data): if an adversary helps anywhere in this framework, it is
here.  Setup mirrors tools/ganft_sweep.py exactly (converge-then-adversarial
from the committed npz snapshot, single full-size STFT-1024 discriminator,
equal G/D LR 2e-4) so rows are comparable with the sweep table; the
feature_multiplier comes from the sweep winner (`ganft_sweep.py best`) or
the CLI.

Usage:
  python tools/energy_ganft.py run  [minutes=60] [fm=sweep-winner's]
  python tools/energy_ganft.py smoke     # CPU pipeline check (needs the
                                         # /tmp/r04_smoke energy donor:
                                         # quality_r04.py --smoke energy_rvq_speech)

Writes QUALITY_r04/sweep/energy_fm<FM>.json (picked up by ganft_sweep.py
report -> GANFT_SWEEP_r04.json -> the QUALITY_r04.md sweep table) plus a
committed artifacts/ckpt/ganft_energy_fm<FM>.npz snapshot.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import ganft_sweep as gs
import quality_r04 as q

DONOR = "energy_rvq_speech"


def make_trainer(fm: float | None, smoke=False):
    """fm=None builds the no-GAN control: same donor/LR/minutes, no
    adversary — isolates the adversarial term from plain extra training."""
    from audio_generation_tpu.config import ExperimentConfig
    from audio_generation_tpu.models.discriminators import STFTDiscriminator
    from audio_generation_tpu.train.trainer import Trainer

    # energy vae_args (bottleneck="energy_rvq") + the sweep's GAN trainer args
    spec = json.loads(json.dumps(q.CONFIGS[DONOR]))
    spec["use_discriminator"] = fm is not None
    spec["train_run_args"] = {}
    spec["vae_args"]["compute_dtype"] = "float32" if smoke else "bfloat16"
    spec["trainer_args"].update(
        use_one_discriminator=True,
        model_lr=2e-4,
        discriminator_lr=2e-4,
        feature_multiplier=0.0 if fm is None else fm,
        save_every=10**6,  # tunnel saves cost minutes; npz snapshot at end
    )
    if smoke:
        spec["vae_args"]["first_block_channels"] = 8
        spec["trainer_args"].update(batch_size=2, mini_epoch_length=4,
                                    crop_size=6144, data_workers=2)
    root = "/tmp/energy_ganft_smoke/" if smoke else "/tmp/energy_ganft/"
    cfg = ExperimentConfig.from_dict(
        {
            "experiment_name": ("energy_ganft_nogan" if fm is None
                                else f"energy_ganft_fm{fm:g}"),
            "dataset": q.DATASET,
            "sample_rate": q.SR,
            "scratch_train": True,  # /tmp run dir; donor snapshot seeds it
            "save_path_root": root,
            **spec,
        }
    )
    discs = None
    if fm is not None:
        discs = (
            [STFTDiscriminator(win_length=1024,
                               first_channel_size=4 if smoke else 32)],
            ["stft_discriminator_1024"],
        )
    return Trainer(cfg, dataset=q.build_dataset(True) if smoke else gs._dataset(),
                   data_sample_rate=q.SR, discriminators=discs)


def run(minutes: float, fm: float | None = None, smoke=False, nogan=False,
        donor: str | None = None, out_tag: str | None = None):
    from audio_generation_tpu.evaluate import evaluate_codec

    if nogan:
        fm = None
        tag = "energy_nogan"
    else:
        if fm is None:
            try:
                win = gs.best()
                fm = gs.VARIANTS[win]
            except SystemExit:
                fm = 2.0  # sweep not done yet — HiFi-GAN's value
        tag = f"energy_fm{fm:g}"
    tag = out_tag or tag
    donor = donor or DONOR
    sweep_dir = "/tmp/energy_ganft_smoke/out" if smoke else gs.SWEEP_DIR
    os.makedirs(sweep_dir, exist_ok=True)
    out_p = os.path.join(sweep_dir, f"{tag}.json")
    if os.path.exists(out_p):
        print(f"[{tag}] exists — skipping")
        return

    trainer = make_trainer(fm, smoke)
    donor_step = q.restore_trainer_from_snapshot(trainer, donor, smoke)
    if donor_step == 0:
        sys.exit(f"no donor snapshot for {donor}")
    waves = q.eval_batch(smoke=smoke)

    deadline = time.time() + minutes * 60
    losses: list = []
    t0 = time.time()
    while time.time() < deadline:
        trainer.train(epochs=1, losses=losses)
        print(f"[{tag}] step {int(trainer.state.step)} "
              f"({(deadline - time.time())/60:.0f} min left)", flush=True)
        if smoke:
            break

    after = evaluate_codec(trainer.model, trainer._variables(), waves, q.SR)
    result = {
        "tag": tag,
        "donor": donor,
        "donor_step": donor_step,
        "feature_multiplier": fm,
        "lr": {"model": 2e-4, "discriminator": 2e-4},
        "adversary": ("none (no-GAN control)" if nogan
                      else "stft_discriminator_1024 (single, full-size)"),
        "steps": int(trainer.state.step),
        "train_minutes": (time.time() - t0) / 60.0,
        "loss_last16": float(np.mean(losses[-16:])) if losses else None,
        "after": {k: round(float(v), 4) for k, v in after.items()},
    }
    if not smoke:
        import jax

        from audio_generation_tpu.train.checkpoint import save_params_npz

        snap_p = os.path.join(q.SNAP_DIR, f"ganft_{tag}.npz")
        size = save_params_npz(
            snap_p,
            jax.device_get(trainer.state.params),
            jax.device_get(trainer.state.codebook),
            {"config": f"ganft_{tag}", "step": int(trainer.state.step),
             "dtype": str(trainer.model.compute_dtype),
             "vae_args": q.CONFIGS[DONOR]["vae_args"],
             "sample_rate": q.SR},
            params_dtype="float16",
        )
        result["snapshot"] = snap_p
        print(f"[{tag}] snapshot -> {snap_p} ({size/1e6:.1f} MB)")
        csv_src = os.path.join(trainer.workdir, "metrics.csv")
        if os.path.exists(csv_src):
            import shutil

            shutil.copy(csv_src, os.path.join(sweep_dir, f"{tag}.metrics.csv"))
    with open(out_p, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "run"
    if cmd == "run":
        minutes = float(sys.argv[2]) if len(sys.argv) > 2 else 60.0
        fm_arg = sys.argv[3] if len(sys.argv) > 3 else None
        if fm_arg == "nogan":
            run(minutes, nogan=True)
        else:
            run(minutes, float(fm_arg) if fm_arg is not None else None)
    elif cmd == "extend":  # continue a saved energy GAN-ft snapshot:
        #   extend <snapshot_name> [minutes=90] [fm=sweep-winner's]
        snap = sys.argv[2]
        minutes = float(sys.argv[3]) if len(sys.argv) > 3 else 90.0
        fm_arg = float(sys.argv[4]) if len(sys.argv) > 4 else None
        run(minutes, fm=fm_arg, donor=snap,
            out_tag=f"{snap.removeprefix('ganft_')}_ext{int(minutes)}")
    elif cmd == "smoke":
        run(0.02, fm=2.0, smoke=True)
        run(0.02, smoke=True, nogan=True)
        print("energy ganft smoke OK")
    else:
        sys.exit(f"unknown command {cmd}")
