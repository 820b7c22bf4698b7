"""Minimal on-TPU compile repro for the fused-stack Pallas kernel.

Compiles ONE fused_residual_stack call per config (no model, no bench) and
prints the full Mosaic error if it rejects. Run serially on an idle TPU.
"""
from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from audio_generation_tpu.ops.stack_pallas import (
    fused_residual_stack,
    residual_stack_xla,
)

DILS = (1, 3, 9)


def mk_blocks(rng, c, k=7, n=3, scale=0.1):
    return tuple(
        (
            jnp.asarray(rng.randn(k, c, c).astype(np.float32) * scale),
            jnp.asarray(rng.randn(c).astype(np.float32) * scale),
            jnp.asarray(rng.randn(1, c, c).astype(np.float32) * scale),
            jnp.asarray(rng.randn(c).astype(np.float32) * scale),
        )
        for _ in range(n)
    )


def try_one(name, dtype, b, lf, c, fold):
    rng = np.random.RandomState(0)
    blocks = jax.tree_util.tree_map(
        lambda a: a.astype(dtype), mk_blocks(rng, c)
    )
    x = jnp.asarray(rng.randn(b, lf, fold * c).astype(np.float32) * 0.1).astype(dtype)
    try:
        y = jax.jit(
            lambda x, bl: fused_residual_stack(x, bl, fold=fold, dilations=DILS)
        )(x, blocks)
        y.block_until_ready()
        ref = residual_stack_xla(x, blocks, fold=fold, dilations=DILS)
        err = float(
            jnp.linalg.norm((y - ref).astype(jnp.float32))
            / (jnp.linalg.norm(ref.astype(jnp.float32)) + 1e-30)
        )
        print(f"[{name}] OK rel_err={err:.2e}", flush=True)
        return True
    except Exception:
        print(f"[{name}] FAILED:", flush=True)
        traceback.print_exc()
        return False


def main():
    print("backend:", jax.default_backend(), jax.devices()[0])
    # smallest first: isolate dtype vs size effects
    try_one("bf16 small single-tile", jnp.bfloat16, 1, 256, 32, 4)
    try_one("f32 small single-tile", jnp.float32, 1, 256, 32, 4)
    try_one("bf16 multi-tile", jnp.bfloat16, 1, 18000, 32, 4)
    try_one("bf16 unfolded C=128", jnp.bfloat16, 1, 1024, 128, 1)


if __name__ == "__main__":
    main()
