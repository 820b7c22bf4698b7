from audio_generation_tpu.train.checkpoint import CheckpointManager  # noqa: F401
from audio_generation_tpu.train.schedule import (  # noqa: F401
    discriminator_optimizer,
    generator_optimizer,
    warmup_cosine_schedule,
)
from audio_generation_tpu.train.state import DiscriminatorState, TrainState  # noqa: F401
from audio_generation_tpu.train.steps import StepBuilder  # noqa: F401
from audio_generation_tpu.train.trainer import Trainer  # noqa: F401
