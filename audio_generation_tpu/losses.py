"""Training objectives.

  * multispectral_reconstruction_loss — EnCodec-style multi-window mel loss
    (arXiv:2008.01160; reference: networks/training.py:51-78): per window w,
    L1(spec) + alpha_w * MSE(log spec) with alpha_w = sqrt(w / 2), summed and
    scaled by spec_loss_weight; NaNs zeroed like the reference's nan_to_num.
  * hinge GAN + L1 feature matching (reference:
    networks/discriminator.py:199-239), expressed as pure functions of the
    discriminator outputs so the caller controls which parameters receive
    gradients (the JAX analog of the reference's three forward passes +
    retain_graph dance — see train/steps.py).
  * time-domain MSE on pre-emphasized waveforms and the waveform sparsity
    prior (reference: networks/training.py:330-352).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from audio_generation_tpu.ops import preemphasis
from audio_generation_tpu.ops.stft import MelSpectrogram


def multispectral_reconstruction_loss(
    original,
    reconstruction,
    spectrograms: Sequence[MelSpectrogram],
    windows: Sequence[int] = tuple(2**i for i in range(5, 12)),
    eps: float = 1e-8,
    spec_loss_weight: float = 1.0,
    use_log_l2: bool = True,
    scale_alpha: bool = True,
):
    """original/reconstruction: (..., L) waveforms (channel dims folded in)."""
    spec_loss = 0.0
    for i, spectrogram in enumerate(spectrograms):
        alpha = jnp.sqrt(windows[i] / 2.0) if scale_alpha else 1.0
        spec_o = jnp.nan_to_num(spectrogram(original))
        spec_r = jnp.nan_to_num(spectrogram(reconstruction))
        spec_loss = spec_loss + jnp.mean(jnp.abs(spec_o - spec_r))
        if use_log_l2:
            spec_loss = spec_loss + alpha * jnp.mean(
                (jnp.log(spec_o + eps) - jnp.log(spec_r + eps)) ** 2
            )
        else:
            spec_loss = spec_loss + alpha * jnp.mean((spec_o - spec_r) ** 2)
    return spec_loss_weight * spec_loss


def reconstruction_loss(x, y, pre_emphasis: float | None = 0.97, weight: float = 10.0):
    """MSE on pre-emphasized waveforms (reference: training.py:330-340)."""
    if pre_emphasis is not None:
        x = preemphasis(x, pre_emphasis)
        y = preemphasis(y, pre_emphasis)
    return weight * jnp.mean((x - y) ** 2)


def sparsity_loss(y, weight: float = 0.01):
    """Waveform sparsity prior (reference: training.py:348-352)."""
    return weight * jnp.mean(jnp.abs(y))


# --------------------------------------------------------------------------- #
# GAN objectives. `scores_*` are lists of per-level score tensors;
# `features_*` are lists of per-layer feature tensors.
# --------------------------------------------------------------------------- #

def hinge_discriminator_loss(scores_real, scores_fake):
    """sum_k (-mean(min(real - 1, 0)) - mean(min(-fake - 1, 0))) / k
    (reference: discriminator.py:220-223). The fake scores must be computed
    from a stop_gradient'ed reconstruction so only D parameters learn."""
    k = len(scores_real)
    loss = 0.0
    for real, fake in zip(scores_real, scores_fake):
        real_term = -jnp.mean(jnp.minimum(real - 1.0, 0.0))
        fake_term = -jnp.mean(jnp.minimum(-fake - 1.0, 0.0))
        loss = loss + (real_term + fake_term) / k
    return loss


def adversarial_generator_loss(scores_fake):
    """sum_k -mean(fake) / k (reference: discriminator.py:225)."""
    k = len(scores_fake)
    loss = 0.0
    for fake in scores_fake:
        loss = loss - jnp.mean(fake) / k
    return loss


def feature_matching_loss(features_real, features_fake, scale: bool = True, eps: float = 1e-3):
    """L1 feature matching over all layers, each scaled by 1/mean|real + eps|
    (reference: discriminator.py:229-235). Real features should be
    stop_gradient'ed by the caller (they are targets)."""
    n = len(features_real)
    loss = 0.0
    for fr, ff in zip(features_real, features_fake):
        fr = jax.lax.stop_gradient(fr)
        term = jnp.mean(jnp.abs(fr - ff)) / n
        if scale:
            term = term / jnp.mean(jnp.abs(fr + eps))
        loss = loss + term
    return loss


def generator_gan_loss(scores_fake, features_real, features_fake, feature_multiplier: float = 100.0):
    """Adversarial + feature-matching generator objective
    (reference: discriminator.py:237)."""
    return adversarial_generator_loss(scores_fake) + feature_multiplier * feature_matching_loss(
        features_real, features_fake
    )
