"""YAML config system.

Mirrors the reference's single-file, four-section, kwargs-splat design
(reference: config/training.yml loaded at networks/training.py:536 with
sections `vae_args` -> CausalVQAE(**...), `trainer_args` -> Trainer(**...),
`train_run_args` -> trainer.train(**...)), but dataclass-validated so typos
fail loudly instead of silently splatting.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence

import yaml


def _filter_kwargs(cls, kwargs: dict, section: str) -> dict:
    known = {f.name for f in dataclasses.fields(cls)}
    unknown = set(kwargs) - known
    if unknown:
        raise ValueError(
            f"Unknown keys in config section '{section}': {sorted(unknown)}; "
            f"valid keys: {sorted(known)}"
        )
    return kwargs


@dataclass
class VAEConfig:
    """Generator/codec hyperparameters (reference: CausalVQAE ctor,
    networks/vae.py:205-291; YAML `vae_args`)."""

    in_channels: int = 1
    n_blocks: int = 5
    n_layers_per_block: int = 4
    first_block_channels: int = 32
    num_quantizers: int = 8
    codebook_size: Any = 1024  # int or per-level list
    codebook_dim: int = 512
    vq_cutoff_freq: float = 1.0
    vq_type: str = "ema"  # "base" | "ema"
    strides: Sequence[int] = (2, 3, 4, 4, 5)
    input_format: str = "b l c"  # "b l c" | "n c l"
    channel_multiplier: int = 2
    depthwise: bool = False
    use_som: bool = True
    som_kernel_type: str = "hard"  # "hard" | "gaussian"
    differentiable_som: bool = False  # gradient-path SOM (arXiv:2302.07950)
    som_temperature: float = 1.0
    wavelet_decoders: Any = field(
        default_factory=lambda: [False, True, False, False, False]
    )
    bottleneck: str = "rvq"  # "rvq" | "energy" | "none" — the energy
    # transformer is the reference's alternative bottleneck
    # (networks/vae.py:347-348; README.md:56), here config-selectable
    energy_kwargs: Optional[dict] = None  # EnergyTransformer ctor overrides
    # TPU-specific knobs (not in the reference):
    param_dtype: str = "float32"
    compute_dtype: str = "float32"  # set "bfloat16" for MXU-friendly training
    remat_blocks: bool = False  # rematerialize enc/dec blocks in backward
    # (needed for reference-scale batch 4 x accum 32 x 72000 on 16 GB HBM)
    lane_fold: Any = True  # exact lane-folded execution of low-channel
    # stacks: true | false | "enc" | "dec" (models/vae.py)
    use_pallas_rvq: bool = False  # inference-only fused Pallas RVQ kernel
    # (ops/rvq_pallas.py): bit-exact indices vs the XLA scan at parity speed
    # on v5e (5.8 vs 5.5 ms @ 4800 frames, round 2) — keep False for
    # training (no codebook updates); requires a uniform codebook_size
    use_pallas_stack: bool = False  # fused VMEM-resident residual stacks
    # (ops/stack_pallas.py): the whole dilated stack in one Pallas kernel —
    # one HBM round trip instead of one per conv. Same math and param tree;
    # differentiable (custom VJP recomputes through the XLA path)
    restart_stale_codebooks: bool = False  # dead-entry reactivation inside
    # the jitted step (models/quantizer.py restart_stale): re-seed entries
    # whose usage EMA fell below stale_threshold from the batch's worst
    # residuals. Off = reference parity (the reference tracks staleness but
    # never acts, networks/training.py:461).

    def __post_init__(self):
        if self.use_pallas_rvq and isinstance(self.codebook_size, (list, tuple)):
            sizes = set(self.codebook_size)
            if len(sizes) > 1:
                raise ValueError(
                    "use_pallas_rvq requires a uniform codebook_size (the "
                    f"kernel tiles one stacked codebook array); got {self.codebook_size}"
                )

    @classmethod
    def from_dict(cls, d: dict) -> "VAEConfig":
        d = dict(d)
        # infer n_blocks from an explicit strides list, and regenerate the
        # default wavelet flags ([False, True, False, ...]) at the new length
        if "strides" in d and "n_blocks" not in d:
            d["n_blocks"] = len(d["strides"])
        if "wavelet_decoders" not in d and d.get("n_blocks", 5) != 5:
            n = d["n_blocks"]
            d["wavelet_decoders"] = [i == 1 for i in range(n)]
        return cls(**_filter_kwargs(cls, dict(d), "vae_args"))


@dataclass
class TrainerConfig:
    """Trainer knobs (reference: Trainer ctor, networks/training.py:91-123;
    YAML `trainer_args`)."""

    model_lr: float = 5e-4
    discriminator_lr: float = 8e-4
    sample_rate: int = 24000
    use_one_discriminator: bool = False
    codebook_update_step: int = 1
    mini_epoch_length: int = 100
    steps_per_epoch: Optional[int] = None
    batch_size: int = 8
    spec_windows: Sequence[int] = tuple(2**i for i in range(5, 12))
    save_every: int = 5
    spec_loss_weight: float = 0.01
    reconstruction_loss_weight: float = 10.0
    raw_reconstruction_weight: float = 0.0  # TPU-repo extension: additional
    # MSE on the *un*-pre-emphasized waveforms. The reference's only
    # phase-sensitive loss is the pre-emphasized MSE (training.py:330-340);
    # pre-emphasis (0.97) attenuates content below ~500 Hz by 25-30 dB, so
    # low-frequency phase gets almost no gradient and SI-SDR plateaus deeply
    # negative while mel converges (measured: tools/diag_sisdr.py). A raw MSE
    # term restores gradient pressure across the whole band.
    generator_loss_weight: float = 1.0
    feature_multiplier: float = 100.0  # feature-matching weight inside the
    # generator GAN objective (the reference hardcodes 100 at
    # discriminator.py:202 `feature_multipier`); exposed because adversarial
    # balance is THE knob for GAN-codec stability — round-3's GAN flagship
    # destabilized at the default (VERDICT r3 weak #3)
    loss_alpha: float = 0.95
    noise_aug_scale: float = 0.0
    cutoff_scale_per_epoch: float = 0.95
    accumulation_steps: int = 8
    frequency_filter: Optional[float] = 5000.0
    codebook_frequency_scale: float = 0.1
    pre_emphasis: Optional[float] = 0.97
    # TPU-specific:
    seed: int = 0
    remat_discriminators: bool = False  # jax.checkpoint the discriminator
    # applies inside the train step (pairs with vae_args.remat_blocks for
    # reference-scale crops on 16 GB HBM)
    data_workers: int = 2  # host-side batch-build threads (decode/resample/
    # crop); per-batch RNG streams keep augmentations deterministic for any
    # worker count
    crop_size: Optional[int] = None  # training crop in samples; default is the
    # reference's 72000 @ 48 kHz scaled to sample_rate (utils.py:149-174)
    mesh_shape: Optional[Sequence[int]] = None  # e.g. [8] or [4, 2]
    mesh_axes: Sequence[str] = ("data",)
    debug_nans: bool = False  # jax.debug_nans mode (SURVEY.md §5.2): trap the
    # first NaN-producing op instead of the per-step watchdog
    eval_every: Optional[int] = 1  # run SNR/SI-SDR/mel evaluation on a fixed
    # held-out batch every N epochs, logged to metrics.csv (None disables).
    # The held-out items are the LAST `eval_items` of the dataset and are
    # excluded from the training permutation.
    eval_items: int = 8
    grad_clip_norm: Optional[float] = None  # global-norm gradient clipping
    # for both generator and discriminators (off = reference parity; the
    # log-mel MSE's eps=1e-8 log can spike gradients when a spectrogram bin
    # hits zero — observed once as a 1e7x loss excursion, CONVERGE_r03)

    @classmethod
    def from_dict(cls, d: dict) -> "TrainerConfig":
        return cls(**_filter_kwargs(cls, dict(d), "trainer_args"))


@dataclass
class RunConfig:
    """Per-run arguments (reference: Trainer.train kwargs,
    networks/training.py:416-424; YAML `train_run_args`)."""

    epochs: int = 5
    gan_loss: bool = True
    multispectral: bool = True
    use_reconstruction_loss: bool = True
    sparsity_weight: float = 0.01
    use_commit_loss: bool = True
    prioritize_early: bool = False

    @classmethod
    def from_dict(cls, d: dict) -> "RunConfig":
        return cls(**_filter_kwargs(cls, dict(d), "train_run_args"))


@dataclass
class ExperimentConfig:
    """Top-level experiment config (reference: config/training.yml top keys,
    consumed by networks/training.py:535-612)."""

    experiment_name: str = "default_experiment"
    save_path_root: str = "runs/"
    dataset: str = "synthetic"
    dataset_path: str = ""
    sample_rate: int = 24000
    use_discriminator: bool = True
    discriminator_bank: str = "full"  # "full" (reference bank,
    # networks/training.py:570-576) | "small" (same architecture, shrunk
    # channels — quick experiments / CPU smoke runs)
    scratch_train: bool = False
    lr: float = 5e-4
    scheduler_warmup: int = 100
    scheduler_total_iter: int = 300000
    vae: VAEConfig = field(default_factory=VAEConfig)
    trainer: TrainerConfig = field(default_factory=TrainerConfig)
    run: RunConfig = field(default_factory=RunConfig)

    @property
    def save_path(self) -> str:
        root = self.save_path_root
        if not root.endswith("/"):
            root = root + "/"
        return root + self.experiment_name + "/"

    @classmethod
    def from_dict(cls, d: dict) -> "ExperimentConfig":
        d = dict(d)
        vae = VAEConfig.from_dict(d.pop("vae_args", {}))
        trainer_kwargs = dict(d.pop("trainer_args", {}))
        run = RunConfig.from_dict(d.pop("train_run_args", {}))
        # reference passes sample_rate to Trainer from the top level
        # (networks/training.py:601); mirror that default flow.
        if "sample_rate" in d and "sample_rate" not in trainer_kwargs:
            trainer_kwargs["sample_rate"] = d["sample_rate"]
        if "lr" in d and "model_lr" not in trainer_kwargs:
            trainer_kwargs["model_lr"] = d["lr"]
        trainer = TrainerConfig.from_dict(trainer_kwargs)
        top = _filter_kwargs(
            cls,
            {k: v for k, v in d.items()},
            "top-level",
        )
        return cls(vae=vae, trainer=trainer, run=run, **top)

    @classmethod
    def from_yaml(cls, path: str) -> "ExperimentConfig":
        with open(path, "r") as f:
            raw = yaml.safe_load(f)
        return cls.from_dict(raw or {})

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)
