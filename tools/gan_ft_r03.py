"""GAN FINE-TUNE of the trained no-GAN flagship (QUALITY_r03 follow-up).

The from-scratch adversarial run (rvq8_gan_hifi) lags no-GAN on every
reconstruction metric at matched steps: on synthetic tones the discriminator
destabilizes waveform phase long before the codec has converged. The regime
the reference's one-discriminator claim (README.md:58) actually matters for
is the standard GAN-codec recipe — converge the reconstruction losses first,
then ADD the adversarial term. This tool runs that experiment:

1. load the trained `rvq8_hifi` checkpoint (generator params + codebooks),
2. seed a NEW experiment `rvq8_gan_ft` with a step-0 checkpoint holding the
   transplanted generator, fresh discriminators, and fresh optimizers
   (step 0 => the LR schedule re-warms, a gentle adversarial onset),
3. hand off to quality_r03.run_config for the wall-clock-budgeted training
   loop — `before` in the artifact is therefore the DONOR's quality, so
   before->after reads directly as "what the GAN did to a working codec".

Usage:
    python tools/gan_ft_r03.py --hours 1.5 --dtype bfloat16
    python tools/gan_ft_r03.py --smoke     # CPU mechanics check, no TPU
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DONOR = "rvq8_hifi"
NAME = "rvq8_gan_ft"


def _trainer(name: str, spec: dict, dtype: str, smoke: bool):
    from audio_generation_tpu.config import ExperimentConfig
    from audio_generation_tpu.train.trainer import Trainer

    from quality_r03 import OUT_DIR, SR

    spec = json.loads(json.dumps(spec))  # deep copy
    spec["vae_args"]["compute_dtype"] = dtype
    kwargs = {}
    if smoke:
        spec["vae_args"]["first_block_channels"] = 8
        spec["trainer_args"].update(batch_size=2, mini_epoch_length=4,
                                    crop_size=6144, eval_every=0)
        if spec.get("use_discriminator"):
            from audio_generation_tpu.models.discriminators import (
                build_discriminators,
            )

            kwargs["discriminators"] = build_discriminators(small=True)
    root = "/tmp/ganft_smoke" if smoke else os.path.join(OUT_DIR, "runs")
    cfg = ExperimentConfig.from_dict(
        {
            "experiment_name": name,
            "dataset": "synthetic",
            "sample_rate": SR,
            "scratch_train": False,
            "save_path_root": root + "/",
            **spec,
        }
    )
    return Trainer(cfg, **kwargs)


def seed_transplant(dtype: str, smoke: bool) -> int:
    """Create the step-0 rvq8_gan_ft checkpoint from the donor. Returns the
    donor step transplanted (0 if the seed already exists)."""
    import jax

    from quality_r03 import CONFIGS, OUT_DIR

    root = "/tmp/ganft_smoke" if smoke else os.path.join(OUT_DIR, "runs")
    seed_meta = os.path.join(root, NAME, "seed.json")
    if os.path.isdir(os.path.join(root, NAME, "checkpoints")) and any(
        os.scandir(os.path.join(root, NAME, "checkpoints"))
    ):
        donor_step = 0
        if os.path.exists(seed_meta):
            donor_step = json.load(open(seed_meta)).get("donor_step", 0)
        print(f"[ganft] {NAME} checkpoint exists — resuming, no transplant "
              f"(seeded from {DONOR} step {donor_step})")
        return donor_step

    donor = _trainer(DONOR, CONFIGS[DONOR], dtype, smoke)
    donor_step = int(donor.state.step)
    if donor_step == 0 and not smoke:
        sys.exit(f"donor {DONOR} has no trained checkpoint — run the "
                 "campaign (tools/quality_r03.py) first")
    donor_params = jax.device_get(donor.state.params)
    donor_codebook = jax.device_get(donor.state.codebook)
    donor.ckpt.close()
    del donor

    gan_spec = json.loads(json.dumps(CONFIGS["rvq8_gan_hifi"]))
    ft = _trainer(NAME, gan_spec, dtype, smoke)
    assert int(ft.state.step) == 0, "fresh rvq8_gan_ft trainer expected"
    ft.state = ft.state.replace(params=donor_params, codebook=donor_codebook)
    ft.save_state()
    ft.ckpt.close()
    with open(seed_meta, "w") as f:
        json.dump({"donor": DONOR, "donor_step": donor_step}, f)
    print(f"[ganft] seeded {NAME} at step 0 from {DONOR} step {donor_step}")
    return donor_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hours", type=float, default=1.5)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()

    donor_step = seed_transplant(args.dtype, args.smoke)

    if args.smoke:
        # mechanics check only: re-open the seeded experiment and verify the
        # transplanted generator round-trips through Orbax bit-exactly
        import numpy as np

        from quality_r03 import CONFIGS

        donor = _trainer(DONOR, CONFIGS[DONOR], args.dtype, True)
        ft = _trainer(NAME, CONFIGS["rvq8_gan_hifi"], args.dtype, True)
        assert int(ft.state.step) == 0
        import jax

        for a, b in zip(
            jax.tree_util.tree_leaves(donor.state.params),
            jax.tree_util.tree_leaves(ft.state.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert len(ft.state.discriminators) > 0, "GAN state expected"
        print("[ganft] smoke OK: transplanted params bit-exact, "
              f"{len(ft.state.discriminators)} discriminators fresh")
        return

    from quality_r03 import CONFIGS, OUT_DIR, run_config

    # register the ft config for run_config/write_markdown (module-level
    # CONFIGS is the registry quality_r03 reads everywhere)
    result = run_config(NAME, args.hours, args.dtype)
    result["donor"] = DONOR
    result["donor_step_at_seed"] = donor_step
    with open(os.path.join(OUT_DIR, f"{NAME}.json"), "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
