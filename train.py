"""Training entry point: `python train.py [config/training.yml]`.

Mirrors the reference's config-driven, argparse-free entry
(networks/training.py:535-612; README.md:32): load the YAML, build the
dataset/model/discriminators/trainer, auto-resume from the newest checkpoint
unless scratch_train, and run.
"""
from __future__ import annotations

import sys

from audio_generation_tpu.config import ExperimentConfig
from audio_generation_tpu.train.trainer import Trainer


def main(config_path: str = "config/training.yml"):
    config = ExperimentConfig.from_yaml(config_path)

    if config.experiment_name == "default_experiment" and sys.stdin.isatty():
        name = input(
            "Please enter an experiment name (or nothing to make it default_experiment):"
        )
        if name:
            config.experiment_name = name

    trainer = Trainer(config)
    print(
        f"Experiment '{config.experiment_name}': dataset={config.dataset}, "
        f"gan={config.use_discriminator}, crop={trainer.crop_size}, "
        f"stride={trainer.model.scale_factor}"
    )
    losses = trainer.train()
    return losses


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "config/training.yml")
