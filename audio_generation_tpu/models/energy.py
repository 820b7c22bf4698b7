"""Energy-transformer bottleneck (Hopfield-style energy-descent attention).

The reference soft-imports an external `energy_transformer` package
(networks/training.py:13-18; README.md:56 — "this bottleneck led to a much
stronger model than RVQ") and swaps it in via `CausalVQAE.replace_quantizer`
(networks/vae.py:347-348). This module is the framework-native equivalent,
following the Energy Transformer formulation (arXiv:2302.07253): a global
energy E(g) = E_attention + E_hopfield over layer-normed tokens, minimized by
`n_iters` explicit gradient-descent steps on the token states.

In JAX the energy descent is just `jax.grad` of the energy w.r.t. the tokens
*inside* the forward pass — natively differentiable for training (the
reference needs torch.func for the same trick, README.md:34).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class EnergyTransformer(nn.Module):
    """Energy-descent bottleneck over (B, L, D) latent frames.

    Returns (tokens_out, aux_loss) where aux_loss is the mean final energy
    scaled by `energy_loss_weight` (0 disables it) — the analog of the RVQ
    commit loss in the trainer's loss accounting.
    """

    dim: int
    n_heads: int = 8
    head_dim: int = 64
    hopfield_ratio: int = 4
    n_iters: int = 12
    step_size: float = 0.1
    beta: float | None = None  # attention inverse temperature
    energy_loss_weight: float = 0.0

    @nn.compact
    def __call__(self, x):
        D = self.dim
        inner = self.n_heads * self.head_dim
        hid = D * self.hopfield_ratio
        beta = self.beta if self.beta is not None else 1.0 / np.sqrt(self.head_dim)

        Wq = self.param("Wq", nn.initializers.normal(0.002), (self.n_heads, D, self.head_dim))
        Wk = self.param("Wk", nn.initializers.normal(0.002), (self.n_heads, D, self.head_dim))
        Xi = self.param("Xi", nn.initializers.normal(0.002), (D, hid))
        # layer-norm parameters of the energy's g-function
        gamma = self.param("gamma", nn.initializers.ones, (D,))
        delta = self.param("delta", nn.initializers.zeros, (D,))

        def g_fn(tokens):
            mu = jnp.mean(tokens, axis=-1, keepdims=True)
            var = jnp.var(tokens, axis=-1, keepdims=True)
            return gamma * (tokens - mu) / jnp.sqrt(var + 1e-5) + delta

        def energy(tokens):
            g = g_fn(tokens)  # (B, L, D)
            q = jnp.einsum("bld,hdm->bhlm", g, Wq, preferred_element_type=jnp.float32)
            k = jnp.einsum("bld,hdm->bhlm", g, Wk, preferred_element_type=jnp.float32)
            scores = beta * jnp.einsum(
                "bhim,bhjm->bhij", q, k, preferred_element_type=jnp.float32
            )
            # E_att = -(1/beta) sum_i,h logsumexp_j scores
            e_att = -(1.0 / beta) * jnp.sum(jax.nn.logsumexp(scores, axis=-1))
            # Hopfield: E_hf = -0.5 sum relu(g @ Xi)^2
            hf = jax.nn.relu(
                jnp.einsum("bld,dk->blk", g, Xi, preferred_element_type=jnp.float32)
            )
            e_hf = -0.5 * jnp.sum(hf**2)
            return (e_att + e_hf) / tokens.shape[0]

        grad_fn = jax.grad(energy)

        def descend(tokens, _):
            return tokens - self.step_size * grad_fn(tokens), None

        tokens, _ = jax.lax.scan(descend, x, None, length=self.n_iters)
        aux = jnp.asarray(0.0, jnp.float32)
        if self.energy_loss_weight > 0:
            aux = self.energy_loss_weight * energy(tokens) / (x.shape[1] * D)
        return tokens, aux
