"""Jitted train steps.

One compiled function = one full optimizer step: a `lax.scan` over
`accumulation_steps` micro-batches (grad accumulation, reference:
networks/training.py:296-390) with the codebook-dependent low-pass
augmentation (training.py:313-318), noise augmentation (training.py:320-323),
periodic codebook-update gating (training.py:305-308), all generator losses,
and — when GAN training — the hinge-D/feature-matching objectives of the
*active* discriminator(s), followed by optax updates for the generator and the
active discriminators.

GAN gradient structure (the JAX analog of the reference's three discriminator
passes + retain_graph at discriminator.py:208-211 and training.py:374-380):
two grad computations over a shared generator forward —

  * generator grads: d/d params_g of [recon + commit + sparsity + mel +
    w * (adv(D(y)) + 100 * fm(D(x), D(y)))], discriminator parameters held
    constant (they are a different argnum, so no stop-gradient gymnastics);
  * discriminator grads: d/d params_d of hinge(D(x), D(stop_gradient(y))).

Unlike the reference — where `loss.backward()` also deposits generator-loss
gradients into discriminator parameters because the optimizers share one
graph (an artifact of torch autograd, not a design choice) — each parameter
set receives exactly its own objective's gradient.

`codebook_n` is traced (masking inside the quantizer), so each discriminator
choice needs no recompile for its bitrate; the *discriminator identity* is
static (STFT window sizes change shapes), giving at most one compiled step per
discriminator — exactly the reference's one-sampled-discriminator regime
(README.md:58, training.py:276-288).
"""
from __future__ import annotations

import functools
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from audio_generation_tpu import losses as L
from audio_generation_tpu.ops import lowpass_biquad
from audio_generation_tpu.ops.stft import make_mel_bank
from audio_generation_tpu.train.state import DiscriminatorState, TrainState


class StepBuilder:
    """Closes over static configuration and builds jitted train steps.

    Args:
      model: CausalVQAE linen module.
      discriminators: list of linen discriminator modules (may be empty).
      disc_names: parallel list of names (for metrics keys).
      trainer_cfg: config.TrainerConfig.
      run_cfg: config.RunConfig.
      gen_tx / disc_tx: optax transforms for generator / discriminators.
    """

    def __init__(self, model, discriminators, disc_names, trainer_cfg, run_cfg, gen_tx, disc_tx):
        self.model = model
        self.discriminators = list(discriminators)
        self.disc_names = list(disc_names)
        self.cfg = trainer_cfg
        self.run = run_cfg
        self.gen_tx = gen_tx
        self.disc_tx = disc_tx
        self.mel_bank = make_mel_bank(trainer_cfg.sample_rate, trainer_cfg.spec_windows)
        self._step_cache = {}
        # Metric-name registry: the ONLY metrics that belong to the
        # discriminator ledger are the D hinge losses emitted by
        # _discriminator_losses as f"{name}_loss". The trainer routes its
        # EWMA breakdown by membership here instead of re-deriving the
        # naming convention with string parsing (a silent-misfile hazard if
        # a metric is ever renamed — tests/test_trainer.py pins this set
        # against the names a real step emits).
        self.discriminator_metrics = frozenset(f"{n}_loss" for n in self.disc_names)

    # ------------------------------------------------------------------ #
    def _model_input(self, x):
        """(B, L) waveform -> the model's input layout."""
        if self.model.input_format == "b l c":
            return x[:, :, None]
        return x[:, None, :]

    def _to_wave(self, y):
        """Model output -> (B, L)."""
        if self.model.input_format == "b l c":
            return y[:, :, 0]
        return y[:, 0, :]

    # ------------------------------------------------------------------ #
    def _generator_losses(self, params, codebook, x, x_aug, codebook_n, update_codebook, disc_states, active):
        """Shared generator forward + all generator-side losses.

        Returns (total_loss, (new_codebook, y, metrics)).
        """
        cfg, run = self.cfg, self.run
        (y_out, commit, _indices), mut = self.model.apply(
            {"params": params, "codebook": codebook},
            self._model_input(x_aug),
            update_codebook,
            codebook_n,
            run.prioritize_early,
            mutable=["codebook"],
        )
        y = self._to_wave(y_out)
        metrics = {}
        total = jnp.float32(0.0)

        if run.use_reconstruction_loss:
            rec = L.reconstruction_loss(
                x, y, pre_emphasis=cfg.pre_emphasis, weight=cfg.reconstruction_loss_weight
            )
            metrics["reconstruction_loss"] = rec
            total = total + rec
            if cfg.raw_reconstruction_weight > 0:
                raw = L.reconstruction_loss(
                    x, y, pre_emphasis=None, weight=cfg.raw_reconstruction_weight
                )
                metrics["raw_reconstruction_loss"] = raw
                total = total + raw
        if run.use_commit_loss:
            metrics["commit_loss"] = commit
            total = total + commit
        if run.sparsity_weight > 0:
            sp = L.sparsity_loss(y, run.sparsity_weight)
            metrics["sparsity_loss"] = sp
            total = total + sp
        if run.multispectral:
            mel = L.multispectral_reconstruction_loss(
                x, y, self.mel_bank, windows=cfg.spec_windows,
                spec_loss_weight=cfg.spec_loss_weight,
            )
            metrics["multispectral_loss"] = mel
            total = total + mel

        for di in active:
            disc = self.discriminators[di]
            dstate = disc_states[di]
            dvars = {"params": dstate.params, "spectral": dstate.spectral}
            dapply = (
                jax.checkpoint(disc.apply)
                if self.cfg.remat_discriminators
                else disc.apply
            )
            scores_real, feats_real = dapply(dvars, x[:, :, None])
            scores_fake, feats_fake = dapply(dvars, y[:, :, None])
            g_loss = L.generator_gan_loss(
                scores_fake, feats_real, feats_fake,
                feature_multiplier=cfg.feature_multiplier,
            )
            metrics[f"{self.disc_names[di]}_g_loss"] = g_loss
            total = total + cfg.generator_loss_weight * g_loss

        return total, (mut["codebook"], y, metrics)

    def _discriminator_losses(self, d_params_list, disc_states, x, y, active):
        """Hinge losses for the active discriminators; updates spectral-norm
        power-iteration state. Returns (total, (new_spectrals, metrics))."""
        y = jax.lax.stop_gradient(y)
        metrics = {}
        new_spectral = {}
        total = jnp.float32(0.0)
        for pi, di in enumerate(active):
            disc = self.discriminators[di]
            params = d_params_list[pi]
            spectral = disc_states[di].spectral
            dapply_mut = functools.partial(disc.apply, mutable=["spectral"])
            dapply = disc.apply
            if self.cfg.remat_discriminators:
                dapply_mut = jax.checkpoint(dapply_mut)
                dapply = jax.checkpoint(dapply)
            (scores_real, _), mut = dapply_mut(
                {"params": params, "spectral": spectral},
                x[:, :, None],
            )
            scores_fake, _ = dapply(
                {"params": params, "spectral": mut["spectral"]}, y[:, :, None]
            )
            d_loss = L.hinge_discriminator_loss(scores_real, scores_fake)
            d_loss = d_loss * self.cfg.generator_loss_weight  # training.py:372
            metrics[f"{self.disc_names[di]}_loss"] = d_loss
            new_spectral[di] = mut["spectral"]
            total = total + d_loss
        return total, (new_spectral, metrics)

    # ------------------------------------------------------------------ #
    def micro_batch(self, active, params, d_params_list, carry, inputs):
        """One micro-batch: augmentations + both grad computations.

        carry = (codebook, disc_states, codebook_n); inputs = (x, rng,
        update_codebook flag). Returns (carry', (g_grads, d_grads, metrics,
        y, x)). Exposed as a method so tests can reproduce the accumulation
        law independently of the scan."""
        cfg = self.cfg
        gan = len(active) > 0
        codebook, disc_states, codebook_n = carry
        x, rng, update_codebook = inputs

        if cfg.frequency_filter is not None:
            cutoff = cfg.frequency_filter * (
                1.0 + codebook_n.astype(jnp.float32) * cfg.codebook_frequency_scale
            )
            x = lowpass_biquad(x, float(cfg.sample_rate), cutoff)
        if cfg.noise_aug_scale:
            x_aug = x + cfg.noise_aug_scale * jax.random.normal(rng, x.shape)
        else:
            x_aug = x

        (g_loss, (new_codebook, y, g_metrics)), g_grads = jax.value_and_grad(
            self._generator_losses, has_aux=True
        )(params, codebook, x, x_aug, codebook_n, update_codebook, disc_states, active)

        if gan:
            (d_loss, (new_spectral, d_metrics)), d_grads = jax.value_and_grad(
                self._discriminator_losses, has_aux=True
            )(d_params_list, disc_states, x, y, active)
            disc_states = tuple(
                ds.replace(spectral=new_spectral[di]) if di in new_spectral else ds
                for di, ds in enumerate(disc_states)
            )
        else:
            d_grads = None
            d_metrics = {}

        metrics = dict(g_metrics)
        metrics.update(d_metrics)
        metrics["generator_total"] = g_loss
        return (new_codebook, disc_states, codebook_n), (g_grads, d_grads, metrics, y, x)

    def build(self, active: tuple[int, ...]):
        """Build (and cache) the jitted optimizer step for a static set of
        active discriminator indices (empty tuple = no GAN)."""
        active = tuple(active)
        if active in self._step_cache:
            return self._step_cache[active]

        cfg = self.cfg
        gan = len(active) > 0

        def step_fn(state: TrainState, batch, codebook_n):
            """batch: (accum, B, L) f32; codebook_n: traced int32."""
            rng, sub = jax.random.split(state.rng)
            accum = batch.shape[0]
            rngs = jax.random.split(sub, accum)
            # GLOBAL micro-step counter: step*accum elapsed micro-batches
            # before this call. A within-step arange would make micro-batch 0
            # update every optimizer step and silently cap the period at
            # `accum`. Deliberate (phase-only) delta vs the reference: its
            # counter i*accumulation_steps + j (training.py:296-305) RESETS at
            # each mini_epoch call, so when codebook_update_step does not
            # divide mini_epoch_length the reference's update phase jumps at
            # mini-epoch boundaries while ours runs uniformly. Identical at
            # the default codebook_update_step=1 and whenever the period
            # divides the mini-epoch length.
            micro_ids = state.step.astype(jnp.int32) * accum + jnp.arange(accum)
            update_flags = (micro_ids % cfg.codebook_update_step) == 0

            d_params_list = tuple(state.discriminators[di].params for di in active)

            # grad accumulation = SUM over micro-batches (torch semantics:
            # backward() accumulates, no averaging — training.py:296-303).
            # Accumulate in the scan CARRY: exactly one gradient copy per
            # parameter set stays resident, instead of `accum` stacked copies
            # (which at the reference config accum=32 would hold 32 full
            # gradient pytrees in HBM). The (x, y) waveform-plot sample also
            # rides the carry, keeping only the last micro-batch's pair.
            g_zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            d_zero = jax.tree_util.tree_map(jnp.zeros_like, d_params_list)
            sample0 = (jnp.zeros_like(batch[0]), jnp.zeros_like(batch[0]))

            def scan_body(carry, inputs):
                inner, g_acc, d_acc, _ = carry
                inner, (g_grads, d_grads, metrics, y, x) = self.micro_batch(
                    active, state.params, d_params_list, inner, inputs
                )
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g_grads)
                if gan:
                    d_acc = jax.tree_util.tree_map(jnp.add, d_acc, d_grads)
                return (inner, g_acc, d_acc, (x, y)), metrics

            init = (
                (state.codebook, state.discriminators, jnp.asarray(codebook_n, jnp.int32)),
                g_zero,
                d_zero,
                sample0,
            )
            ((inner, g_grad_sum, d_grad_sums, sample), metrics) = jax.lax.scan(
                scan_body, init, (batch, rngs, update_flags)
            )
            codebook, disc_states, _ = inner

            updates, opt_state = self.gen_tx.update(g_grad_sum, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)

            new_disc_states = list(disc_states)
            if gan:
                for pi, di in enumerate(active):
                    ds = new_disc_states[di]
                    d_updates, d_opt = self.disc_tx.update(
                        d_grad_sums[pi], ds.opt_state, ds.params
                    )
                    new_disc_states[di] = ds.replace(
                        params=optax.apply_updates(ds.params, d_updates),
                        opt_state=d_opt,
                    )

            mean_metrics = {k: jnp.mean(v) for k, v in metrics.items()}
            mean_metrics["grad_norm"] = optax.global_norm(g_grad_sum)
            mean_metrics["update_norm"] = optax.global_norm(updates)
            mean_metrics["nan_flag"] = jnp.any(
                ~jnp.isfinite(metrics["generator_total"])
            ).astype(jnp.float32)

            new_state = state.replace(
                step=state.step + 1,
                params=params,
                codebook=codebook,
                opt_state=opt_state,
                discriminators=tuple(new_disc_states),
                rng=rng,
            )
            return new_state, mean_metrics, sample

        jitted = jax.jit(step_fn, donate_argnums=(0,))
        self._step_cache[active] = jitted
        return jitted
