"""Pure-functional training state.

The reference's mutable Trainer state (networks/training.py:90-245) becomes an
explicit pytree: generator params + codebook state + optimizer states + one
(params, spectral-state, opt-state) triple per discriminator + step counter +
rng. Everything a checkpoint needs is this one dataclass (SURVEY.md §7
"design stance").
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class DiscriminatorState:
    params: Any
    spectral: Any  # power-iteration u vectors ('spectral' collection)
    opt_state: Any


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray  # global optimizer-step counter (drives the LR schedule)
    params: Any  # generator params
    codebook: Any  # 'codebook' collection (QuantizerState)
    opt_state: Any  # generator optimizer state
    discriminators: Any  # tuple[DiscriminatorState, ...] (possibly empty)
    rng: jax.Array


def count_params(tree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))
