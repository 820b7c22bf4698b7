"""Activation functions (reference: networks/utils.py:44-105).

The snake activations are the only `torch.jit.script`-compiled functions in
the reference; under XLA they fuse into neighbouring ops for free.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def leaky_relu(x, negative_slope=0.1):
    return jnp.where(x >= 0, x, negative_slope * x)


def snake(x, alpha, eps=1e-6):
    """x + (1/alpha) * sin^2(alpha x)  (arXiv:2206.04658;
    reference: networks/utils.py:44-59)."""
    return x + (1.0 / (alpha + eps)) * jnp.sin(alpha * x) ** 2


def snake_relu(x, alpha, eps=1e-6):
    """ReLU-flavoured snake (reference: networks/utils.py:61-73)."""
    return jnp.clip(x, 0.0, None) + (1.0 / (alpha + eps)) * jnp.sin(alpha * x) ** 2


def glu(x, axis=-1):
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)
