"""LR schedule: linear warmup then cosine annealing to lr/100.

Reference: WarmUpScheduler (networks/training.py:20-49) — during warmup the LR
ramps linearly 0 -> base; afterwards CosineAnnealingLR decays base -> lr/100
over (total_iter - warmup) steps. Expressed as an optax schedule so it lives
inside the jitted update (no host-side stepping; the step counter is state).
"""
from __future__ import annotations

import optax


def warmup_cosine_schedule(base_lr: float, warmup_iter: int, total_iter: int = 300000, min_lr: float | None = None):
    if min_lr is None:
        min_lr = base_lr / 100.0
    warmup = optax.linear_schedule(0.0, base_lr, max(warmup_iter, 1))
    cosine = optax.cosine_decay_schedule(
        base_lr, max(total_iter - warmup_iter, 1), alpha=min_lr / base_lr
    )
    return optax.join_schedules([warmup, cosine], [warmup_iter])


def generator_optimizer(base_lr: float, warmup_iter: int, total_iter: int = 300000,
                        clip_norm: float | None = None):
    """Adam(amsgrad) + warmup-cosine, matching the reference entry point
    (networks/training.py:590-594). `clip_norm` prepends global-norm gradient
    clipping (not in the reference — its log-mel MSE has an eps=1e-8 log that
    can spike gradients ~1e7x when a spectrogram bin hits zero; clipping turns
    such rare events into a bounded step instead of a divergence)."""
    opt = optax.amsgrad(warmup_cosine_schedule(base_lr, warmup_iter, total_iter))
    if clip_norm is not None:
        opt = optax.chain(optax.clip_by_global_norm(clip_norm), opt)
    return opt


def discriminator_optimizer(lr: float, clip_norm: float | None = None):
    """Plain Adam per discriminator (reference: networks/training.py:188)."""
    opt = optax.adam(lr)
    if clip_norm is not None:
        opt = optax.chain(optax.clip_by_global_norm(clip_norm), opt)
    return opt
