"""Training runtime: host-side orchestration around the jitted steps.

Reference: Trainer (networks/training.py:90-533). Reproduced capabilities
(SURVEY.md §2.7):
  1. mini-epoch loop with gradient accumulation (inside the jitted step);
  2. one-sampled discriminator via softmax over running "discriminator
     energies" (training.py:276-288; the energy lookup is implemented as
     evidently intended — the reference's lookup key never matches and always
     falls back to the mean, training.py:399-409);
  3. discriminator-tied codebook dropout (codebook_options,
     training.py:196-199) and random codebook_n without GAN (training.py:294);
  4. codebook-depth-dependent low-pass augmentation (in-step);
  5. optional noise augmentation (in-step);
  6. periodic codebook-update gating (in-step);
  7. GAN interleave: generator and active-discriminator optimizers step each
     accumulation window (in-step);
  8. NaN watchdog (training.py:376-378);
  9. epoch hooks: reshuffled data, cutoff decay x0.95, reconstruction wav,
     loss-breakdown report, stale-cluster report, periodic checkpoints, loss
     curve artifact (training.py:433-484);
 10. bottleneck-swap training `train_new_quantizer` (training.py:502-523)
     with slow encoder/decoder LRs;
 11. `sample_data` eval reconstruction (training.py:488-500).
"""
from __future__ import annotations

import os
import time
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from audio_generation_tpu.config import ExperimentConfig
from audio_generation_tpu.data import collate, get_dataset, write_wav
from audio_generation_tpu.models.discriminators import build_discriminators
from audio_generation_tpu.models.vae import model_from_config
from audio_generation_tpu.train.checkpoint import CheckpointManager
from audio_generation_tpu.train.schedule import (
    discriminator_optimizer,
    generator_optimizer,
)
from audio_generation_tpu.train.state import DiscriminatorState, TrainState
from audio_generation_tpu.train.steps import StepBuilder
from audio_generation_tpu.utils.misc import np_softmax, print_stale_clusters


class Trainer:
    def __init__(
        self,
        config: ExperimentConfig,
        dataset=None,
        data_sample_rate: Optional[int] = None,
        workdir: Optional[str] = None,
        mesh=None,
        discriminators=None,  # optional (modules, names) override
    ):
        self.config = config
        cfg = config.trainer
        self.cfg = cfg
        if cfg.debug_nans:
            # trap the first NaN-producing op (SURVEY.md §5.2); heavier than
            # the in-step watchdog, meant for debugging runs
            jax.config.update("jax_debug_nans", True)
        # persistent compilation cache: full GAN-step compiles take minutes
        if not jax.config.jax_compilation_cache_dir:
            jax.config.update(
                "jax_compilation_cache_dir",
                os.path.expanduser("~/.cache/audio_generation_tpu/xla"),
            )
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
        self.run = config.run
        self.workdir = workdir or config.save_path
        os.makedirs(self.workdir, exist_ok=True)
        self.image_dir = os.path.join(self.workdir, "waveform_plots")
        os.makedirs(self.image_dir, exist_ok=True)

        if dataset is None:
            dataset, data_sample_rate = get_dataset(
                config.dataset, config.dataset_path, sample_rate=config.sample_rate
            )
        self.dataset = dataset
        self.data_sample_rate = data_sample_rate or config.sample_rate
        if cfg.crop_size is not None:
            self.crop_size = int(cfg.crop_size)
        else:
            self.crop_size = (
                72000 if cfg.sample_rate >= 44100 else 72000 * cfg.sample_rate // 48000
            )
        # keep crops divisible by the codec stride so shapes stay exact
        self.model = model_from_config(config.vae)
        stride = self.model.scale_factor
        self.crop_size = max(stride, (self.crop_size // stride) * stride)

        # adversarial training needs BOTH the top-level use_discriminator and
        # the per-run gan_loss toggle (reference: train(gan_loss=...) gates
        # the adversarial objective per run, networks/training.py:416-424;
        # previously gan_loss was validated but never read, so a
        # gan_loss: false run still built + trained all 6 discriminators)
        self.gan = config.use_discriminator and config.run.gan_loss
        if self.gan:
            if discriminators is not None:
                self.discriminators, self.disc_names = discriminators
            else:
                self.discriminators, self.disc_names = build_discriminators(
                    small=(config.discriminator_bank == "small")
                )
            nq = config.vae.num_quantizers
            # max(..., 1) also covers an injected single-discriminator bank
            # (len - 1 == 0 would ZeroDivisionError)
            nq_per_d = max(nq // max(len(self.discriminators) - 1, 1), 1)
            # codebook_options ties bitrate to the chosen discriminator
            # (reference: training.py:196-199)
            self.codebook_options = (
                [nq]
                + [min(nq_per_d * (i + 1), nq) for i in range(len(self.discriminators) - 2)]
                + [nq]
            )
        else:
            self.discriminators, self.disc_names = [], []
            self.codebook_options = [config.vae.num_quantizers]

        # cfg.model_lr is the per-trainer LR knob; config.from_dict aliases
        # the top-level `lr` into it when trainer_args.model_lr is unset
        # (reference: Trainer(model_lr=...), networks/training.py:120)
        self.gen_tx = generator_optimizer(
            cfg.model_lr, config.scheduler_warmup, config.scheduler_total_iter,
            clip_norm=cfg.grad_clip_norm,
        )
        self.disc_tx = discriminator_optimizer(
            cfg.discriminator_lr, clip_norm=cfg.grad_clip_norm
        )
        self.steps = StepBuilder(
            self.model, self.discriminators, self.disc_names, cfg, self.run,
            self.gen_tx, self.disc_tx,
        )
        # config-driven multi-chip training: build the mesh from
        # trainer_args.mesh_shape/mesh_axes (TPU-native scaling; the reference
        # is single-device, networks/training.py:537) unless one was injected.
        if mesh is None and cfg.mesh_shape is not None:
            from audio_generation_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(tuple(cfg.mesh_shape), tuple(cfg.mesh_axes))
            if "data" in mesh.axis_names:
                assert cfg.batch_size % mesh.shape["data"] == 0, (
                    f"batch_size {cfg.batch_size} not divisible by data axis "
                    f"{mesh.shape['data']}"
                )
        self.mesh = mesh

        self.state = self._init_state(jax.random.key(cfg.seed))
        self.epoch = 0
        self.mini_epoch_i = 0
        self.loss_breakdown = {"generator": {}, "discriminator": {}}
        self.d_energies: Optional[list] = None
        self._np_rng = np.random.default_rng(cfg.seed)

        # in-loop evaluation: hold out the LAST eval_items of the dataset
        # (excluded from the training permutation in _data_iterator) so every
        # run logs SNR/SI-SDR/mel trajectories to metrics.csv for free
        self.n_eval = 0
        # truthiness on purpose: eval_every in (None, 0) disables in-loop eval
        # AND must not hold items out of training (the eval-time guard below
        # is also truthiness — keep them consistent)
        if cfg.eval_every and len(self.dataset) >= 4 * cfg.eval_items:
            self.n_eval = int(cfg.eval_items)
        self._eval_waves_cache = None

        from audio_generation_tpu.utils.metrics import MetricsWriter

        self.metrics_writer = MetricsWriter(os.path.join(self.workdir, "metrics.csv"))
        self.ckpt = CheckpointManager(os.path.join(self.workdir, "checkpoints"))
        if not config.scratch_train:
            self._maybe_resume()

    # ------------------------------------------------------------------ #
    def _init_state(self, rng) -> TrainState:
        gen_rng, *disc_rngs = jax.random.split(rng, 1 + max(len(self.discriminators), 1))
        x = jnp.zeros((1, self.crop_size), dtype=jnp.float32)
        # jit the initializers: eager per-op dispatch is slow on remote TPUs
        variables = jax.jit(self.model.init)(gen_rng, self.steps._model_input(x))
        params = variables["params"]
        codebook = dict(variables.get("codebook", {}))
        opt_state = self.gen_tx.init(params)

        disc_states = []
        for disc, drng in zip(self.discriminators, disc_rngs):
            dvars = jax.jit(disc.init)(drng, x[:, :, None])
            disc_states.append(
                DiscriminatorState(
                    params=dvars["params"],
                    spectral=dvars.get("spectral", {}),
                    opt_state=self.disc_tx.init(dvars["params"]),
                )
            )
        state = TrainState(
            step=jnp.asarray(0, jnp.int32),
            params=params,
            codebook=codebook,
            opt_state=opt_state,
            discriminators=tuple(disc_states),
            rng=jax.random.key(self.cfg.seed + 1),
        )
        if self.mesh is not None:
            from audio_generation_tpu.parallel.mesh import shard_train_state

            state = shard_train_state(state, self.mesh)
        return state

    def _maybe_resume(self):
        restored = self.ckpt.restore_latest(self.state)
        if restored is None:
            return
        state, meta, step = restored
        if self.mesh is not None:
            from audio_generation_tpu.parallel.mesh import shard_train_state

            state = shard_train_state(state, self.mesh)
        self.state = state
        self.epoch = int(meta.get("epoch", 0))
        self.mini_epoch_i = int(meta.get("mini_epoch_i", 0))
        self.loss_breakdown = meta.get("loss_breakdown", self.loss_breakdown)
        print(f"\tResumed from checkpoint step {step} (epoch {self.epoch})")

    # ------------------------------------------------------------------ #
    def update_loss_breakdown(self, value: float, name: str, group: str = "generator"):
        """EWMA ledger (reference: training.py:247-251 — note the reference
        weights the *new* value by alpha)."""
        ledger = self.loss_breakdown[group]
        if name not in ledger:
            ledger[name] = float(value)
        else:
            a = self.cfg.loss_alpha
            ledger[name] = float(value) * a + ledger[name] * (1 - a)

    def print_loss_breakdown(self):
        print("\tLoss breakdown:")
        for group in ["generator", "discriminator"]:
            print(f"\t\t{group}:")
            total = sum(self.loss_breakdown[group].values()) or 1.0
            for key, value in self.loss_breakdown[group].items():
                print(f"\t\t\t{key}: {round(value, 4)} ({round(100 * value / total, 2)}%)")

    # ------------------------------------------------------------------ #
    def _pick_discriminator(self):
        """Softmax-sample one discriminator by running energy; returns
        (active indices tuple, codebook_n). Reference: training.py:276-294."""
        if not self.gan:
            nq = self.config.vae.num_quantizers
            # reference: np.random.randint(2, nq + 1) (training.py:294) —
            # which crashes for nq == 1; clamp so single-codebook models train
            return (), int(self._np_rng.integers(min(2, nq), nq + 1))
        if not self.cfg.use_one_discriminator:
            return tuple(range(len(self.discriminators))), self.config.vae.num_quantizers
        energies = self.d_energies or [1.0] * len(self.discriminators)
        probs = np_softmax(energies)
        di = int(self._np_rng.choice(len(self.discriminators), p=probs))
        return (di,), self.codebook_options[di]

    def _recompute_energies(self):
        """Per-discriminator energies from the generator-loss ledger
        (reference intent at training.py:399-409)."""
        gen = self.loss_breakdown["generator"]
        values = [gen.get(f"{n}_g_loss") for n in self.disc_names]
        known = [v for v in values if v is not None and np.isfinite(v)]
        mean = float(np.mean(known)) if known else 1.0
        self.d_energies = [
            v if (v is not None and np.isfinite(v)) else mean for v in values
        ]

    # ------------------------------------------------------------------ #
    def _data_iterator(self, shuffle=True):
        """Yields (accum, B, crop) float32 batches, reshuffled per epoch.
        Batch building (wav decode / resample / crop) runs on a
        `data_workers` thread pool with per-batch RNG streams (deterministic
        for any worker count), and the prefetcher overlaps host->device
        transfer with the device step.

        Multi-host (SURVEY §2.9 per-host data loading): each process builds
        ONLY its own `host_batch_slice` rows of the global batch and
        assembles the global sharded array via
        jax.make_array_from_process_local_data — no raw audio crosses hosts.
        The shuffle permutation and per-batch seeds derive from the trainer
        seed, so all processes agree on the item->row assignment without
        communication. (Crop-RNG consumption order differs from a
        single-process run of the same global batch; determinism holds per
        (process_count, worker_count) configuration.)"""
        from audio_generation_tpu.data.loader import parallel_batches, prefetch

        idx = np.arange(len(self.dataset) - self.n_eval)  # eval tail held out
        if shuffle:
            self._np_rng.shuffle(idx)
        B, A = self.cfg.batch_size, self.cfg.accumulation_steps
        need = B * A
        n_batches = len(idx) // need
        seed = int(self._np_rng.integers(0, 2**31))

        pc = jax.process_count()
        if pc > 1:
            from audio_generation_tpu.parallel.mesh import host_batch_slice

            assert self.mesh is not None and "data" in self.mesh.axis_names, (
                "multi-process training requires a mesh with a 'data' axis"
            )
            hs, hn = host_batch_slice(B)
        else:
            hs, hn = 0, B

        def build(bi: int):
            # sequence-seeded so (epoch seed, batch index) streams never alias
            rng = np.random.default_rng([seed, bi])
            sel = idx[bi * need : (bi + 1) * need]
            if hn != B:  # this host's rows of every accumulation micro-batch
                sel = sel.reshape(A, B)[:, hs : hs + hn].reshape(-1)
            items = [self.dataset[int(i)][0] for i in sel]
            batch = collate(
                items,
                size=self.crop_size,
                rng=rng,
                resample_from=self.data_sample_rate,
                resample_to=self.cfg.sample_rate,
            )
            return batch.reshape(A, hn, self.crop_size)

        def gen():
            yield from parallel_batches(
                build, n_batches, num_workers=self.cfg.data_workers
            )

        # overlap host collation + transfer with device compute
        sharding = None
        assemble = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            spec = P(None, "data", None)
            sharding = NamedSharding(self.mesh, spec)
            if pc > 1:
                from audio_generation_tpu.parallel.mesh import (
                    global_batch_from_local,
                )

                mesh = self.mesh
                assemble = lambda b: global_batch_from_local(b, mesh, spec)
        yield from prefetch(gen(), n_prefetch=2, sharding=sharding,
                            assemble=assemble)

    def _shard_batch(self, batch):
        if self.mesh is None:
            return jnp.asarray(batch)
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(
            batch, NamedSharding(self.mesh, P(None, "data", None))
        )

    # ------------------------------------------------------------------ #
    def mini_epoch(self, data_iter, losses: Optional[list] = None):
        """One mini-epoch: pick the active discriminator(s), run
        mini_epoch_length // accumulation_steps optimizer steps
        (reference: training.py:261-413)."""
        active, codebook_n = self._pick_discriminator()
        step_fn = self.steps.build(active)
        n_opt_steps = max(self.cfg.mini_epoch_length // self.cfg.accumulation_steps, 1)

        sample = None
        for _ in range(n_opt_steps):
            batch = next(data_iter, None)
            if batch is None:
                break
            self.state, metrics, sample = step_fn(
                self.state, batch, jnp.asarray(codebook_n, jnp.int32)
            )
            metrics = jax.device_get(metrics)
            if metrics.pop("nan_flag", 0.0) > 0:
                raise ValueError(
                    f"NaN loss during mini-epoch {self.mini_epoch_i} "
                    f"(active discriminators {active})"
                )
            total = float(metrics.pop("generator_total"))
            self.metrics_writer.write(int(self.state.step), {**metrics, "total": total})
            if losses is not None:
                losses.append(total)
            for name, value in metrics.items():
                if name in ("grad_norm", "update_norm"):  # diagnostics, not
                    continue  # losses — they would inflate the breakdown %s
                group = (
                    "discriminator"
                    if name in self.steps.discriminator_metrics
                    else "generator"
                )
                self.update_loss_breakdown(float(value), name, group)

        if sample is not None:
            self._save_waveform_plot(sample)
        if self.gan:
            self._recompute_energies()
        self.mini_epoch_i += 1
        return sample

    def eval_batch(self) -> Optional[np.ndarray]:
        """The fixed held-out (B, L) eval batch (last n_eval dataset items,
        collated with a constant rng so crops are identical across epochs)."""
        if self.n_eval == 0:
            return None
        if self._eval_waves_cache is None:
            items = [
                self.dataset[len(self.dataset) - self.n_eval + i][0]
                for i in range(self.n_eval)
            ]
            self._eval_waves_cache = collate(
                items,
                size=self.crop_size,
                rng=np.random.default_rng(60833),
                resample_from=self.data_sample_rate,
                resample_to=self.cfg.sample_rate,
            )
        return self._eval_waves_cache

    def evaluate(self) -> Optional[dict]:
        """SNR/SI-SDR/mel-L1 on the held-out batch with the current params
        (in-loop analog of audio_generation_tpu.evaluate.evaluate_codec)."""
        waves = self.eval_batch()
        if waves is None:
            return None
        from audio_generation_tpu.evaluate import evaluate_codec

        m = evaluate_codec(
            self.model, self._variables(), waves, self.cfg.sample_rate
        )
        out = {
            "eval_snr_db": m["snr_db"],
            "eval_si_sdr_db": m["si_sdr_db"],
            "eval_mel_l1": m["mel_l1"],
            "eval_spectral_convergence": m["spectral_convergence"],
            "eval_log_stft_l1": m["log_stft_l1"],
            "eval_mcd_db": m["mcd_db"],
            "eval_stoi_proxy": m["stoi_proxy"],
        }
        if "effective_bitrate_bps" in m:
            out["eval_effective_kbps"] = m["effective_bitrate_bps"] / 1000.0
        stale = self._stale_clusters()
        if stale:
            sizes = self.model.quantizer.codebook_sizes
            out["eval_stale_frac"] = float(sum(stale)) / float(sum(sizes))
        return out

    def train(self, epochs: Optional[int] = None, losses: Optional[list] = None,
              deadline: Optional[float] = None):
        """Full training loop (reference: training.py:416-486).

        deadline: optional absolute time.time() bound checked between
        MINI-epochs (~20 s granularity) — budgeted A/B arms stay
        wall-clock-matched instead of overshooting by up to a full epoch
        (the round-4 wavelet A/B overshot one arm by 20 min that way). The
        epoch-tail hooks (cutoff decay, eval, checkpoint) still run for the
        partial epoch, so two arms cut at the same deadline see the same
        hook schedule."""
        epochs = epochs if epochs is not None else self.run.epochs
        if losses is None:
            losses = []
        if epochs == 0:
            # pure no-op (used e.g. to swap a bottleneck without training);
            # notably does NOT re-save at the resumed step, which Orbax
            # would reject as a duplicate
            return losses
        # epoch sizing is exact reference parity (training.py:426-430):
        # steps_per_epoch clamps the *item* count, and the mini-epoch count is
        # items // (mini_epoch_length * batch_size)
        n_steps = len(self.dataset)
        if self.cfg.steps_per_epoch is not None:
            n_steps = min(n_steps, self.cfg.steps_per_epoch)
        n_mini_epochs = max(n_steps // (self.cfg.mini_epoch_length * self.cfg.batch_size), 1)

        quantizer = self.model.quantizer
        last_saved = -1
        for _ in range(epochs):
            t0 = time.time()
            epoch_losses: list = []
            stale_start = self._stale_clusters()
            data_iter = self._data_iterator(shuffle=True)

            for _ in range(n_mini_epochs):
                sample = self.mini_epoch(data_iter, losses=epoch_losses)
                if deadline is not None and time.time() >= deadline:
                    break

            # cutoff decay x0.95/epoch (reference: training.py:454)
            if self.config.vae.use_som and "state" in self.state.codebook:
                self.state = self.state.replace(
                    codebook={
                        "state": quantizer.update_cutoff(
                            self.state.codebook["state"], ratio=self.cfg.cutoff_scale_per_epoch
                        )
                    }
                )

            if sample is not None:
                y = np.asarray(sample[1])[0]
                write_wav(
                    os.path.join(self.workdir, f"epoch_{self.epoch}_sample.wav"),
                    y, self.cfg.sample_rate,
                )

            mean_loss = float(np.mean(epoch_losses)) if epoch_losses else float("nan")
            print(f"Epoch {self.epoch} mean loss: {mean_loss:.4f} ({time.time()-t0:.1f}s)")
            if (
                self.n_eval
                and self.cfg.eval_every
                and self.epoch % self.cfg.eval_every == 0
            ):
                ev = self.evaluate()
                if ev is not None:
                    self.metrics_writer.write(int(self.state.step), ev)
                    print(
                        "\teval: "
                        + "  ".join(f"{k[5:]} {v:+.3f}" for k, v in ev.items())
                    )
            self.print_loss_breakdown()
            print_stale_clusters(stale_start, self._stale_clusters())

            if self.epoch % self.cfg.save_every == 0:
                self.save_state()
                last_saved = int(self.state.step)
            losses.extend(epoch_losses)
            self.epoch += 1
            if deadline is not None and time.time() >= deadline:
                break

        if int(self.state.step) != last_saved:
            self.save_state()
        self.metrics_writer.flush()
        self._save_loss_curve(losses)
        return losses

    # ------------------------------------------------------------------ #
    def _stale_clusters(self):
        if "state" not in (self.state.codebook or {}):
            return []
        return self.model.quantizer.get_stale_clusters(self.state.codebook["state"])

    def save_state(self, force: bool = False):
        # idempotent per step: Orbax rejects a duplicate save at an existing
        # step (zero-step epochs and resume-then-save could otherwise crash).
        # `force=True` replaces the existing checkpoint instead — required
        # when the in-memory state was MUTATED at the current step (e.g. a
        # params/codebook transplant onto a freshly seeded trainer, as the
        # GAN fine-tune flow does); without it the transplant would be
        # silently dropped.
        if self.ckpt.latest_step() == int(self.state.step):
            if not force:
                print(
                    f"\tSkipping save: checkpoint at step {int(self.state.step)} "
                    "already exists (pass force=True to replace)"
                )
                return
            self.ckpt.delete(int(self.state.step))
        self.ckpt.save(
            int(self.state.step),
            self.state,
            metadata={
                "epoch": self.epoch,
                "mini_epoch_i": self.mini_epoch_i,
                "loss_breakdown": self.loss_breakdown,
            },
        )
        print(f"\tSaved checkpoint at step {int(self.state.step)}")

    # ------------------------------------------------------------------ #
    def _variables(self):
        v = {"params": self.state.params}
        if self.state.codebook:
            v["codebook"] = self.state.codebook
        return v

    @property
    def _jitted_forward(self):
        if not hasattr(self, "_fwd_cache"):
            model = self.model

            @jax.jit
            def fwd(variables, x):
                (y, commit, idx), _ = model.apply(variables, x, mutable=["codebook"])
                return y, commit, idx

            self._fwd_cache = fwd
        return self._fwd_cache

    def sample_data(self, length_multiple: int = 5):
        """Eval-mode reconstruction of one random, longer dataset clip
        (reference: training.py:488-500)."""
        i = int(self._np_rng.integers(0, len(self.dataset)))
        x = self.dataset[i][0]
        batch = collate(
            [x],
            size=self.crop_size * length_multiple,
            rng=self._np_rng,
            resample_from=self.data_sample_rate,
            resample_to=self.cfg.sample_rate,
        )
        y, _, _ = self._jitted_forward(
            self._variables(), self.steps._model_input(jnp.asarray(batch))
        )
        return np.asarray(self.steps._to_wave(y))[0]

    def reconstruct(self, wave: np.ndarray) -> np.ndarray:
        """Encode+decode a (L,) waveform with the current model."""
        stride = self.model.scale_factor
        L = (len(wave) // stride) * stride
        x = jnp.asarray(wave[None, :L], dtype=jnp.float32)
        y, _, _ = self._jitted_forward(self._variables(), self.steps._model_input(x))
        return np.asarray(self.steps._to_wave(y))[0]

    def train_new_quantizer(self, bottleneck: str = "energy", slow_lr: float = 1e-6,
                            energy_kwargs: Optional[dict] = None, **train_kwargs):
        """Swap the bottleneck (e.g. RVQ -> energy transformer) and retrain
        with slow encoder/decoder LRs (reference: training.py:502-523 +
        networks/vae.py:347-348). Generator params are re-initialized for the
        new bottleneck and encoder/decoder weights are carried over."""
        import dataclasses as dc

        new_model = dc.replace(
            self.model, bottleneck=bottleneck, energy_kwargs=energy_kwargs
        )
        x = jnp.zeros((1, self.crop_size), dtype=jnp.float32)
        # jitted: eager full-model init dispatches per-op through the tunnel
        variables = jax.jit(new_model.init)(
            jax.random.key(0), self.steps._model_input(x)
        )
        new_params = dict(variables["params"])
        for key, value in self.state.params.items():
            if key in new_params:
                new_params[key] = value  # carry over encoder/decoder stacks

        # per-group LRs: slow for enc/dec, full for the new bottleneck
        def label_fn(params):
            return {
                k: ("bottleneck" if "bottleneck" in k or "energy" in k else "codec")
                for k in params
            }

        tx = optax.multi_transform(
            {
                "codec": optax.adam(slow_lr),
                "bottleneck": optax.adam(self.cfg.model_lr),
            },
            label_fn,
        )
        self.model = new_model
        self.gen_tx = tx
        # the eval-forward cache closed over the OLD model — drop it
        if hasattr(self, "_fwd_cache"):
            del self._fwd_cache
        self.steps = StepBuilder(
            self.model, self.discriminators, self.disc_names, self.cfg, self.run,
            self.gen_tx, self.disc_tx,
        )
        self.state = self.state.replace(
            params=new_params,
            codebook=dict(variables.get("codebook", {})),
            opt_state=tx.init(new_params),
        )
        return self.train(**train_kwargs)

    # ------------------------------------------------------------------ #
    def _save_waveform_plot(self, sample):
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return
        x, y = (np.asarray(t)[0] for t in sample)
        fig, ax = plt.subplots(1, 1)
        t = np.arange(len(x)) / self.cfg.sample_rate
        ax.plot(t, x, linewidth=1, alpha=0.3, color="blue")
        ax.plot(t, y, linewidth=1, alpha=0.3, color="red")
        ax.grid(True)
        fig.suptitle("waveform")
        fig.savefig(
            os.path.join(self.image_dir, f"sample_{self.epoch}_{self.mini_epoch_i}.png")
        )
        plt.close(fig)

    def _save_loss_curve(self, losses):
        if not losses:
            return
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            from audio_generation_tpu.utils.misc import losses_to_running_loss

            fig, ax = plt.subplots()
            ax.plot(losses_to_running_loss(losses))
            fig.savefig(os.path.join(self.workdir, "loss_curve.png"))
            plt.close(fig)
        except Exception:
            np.save(os.path.join(self.workdir, "losses.npy"), np.asarray(losses))
