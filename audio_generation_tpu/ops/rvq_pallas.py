"""Fused residual-VQ encode kernel (Pallas/TPU).

The whole RVQ cascade — per level: distances (MXU matmul) -> argmin ->
one-hot dequantize (MXU matmul) -> residual subtract — runs in ONE kernel per
frame tile, with the residual held in VMEM across all levels and each level's
codebook DMA'd from HBM under double buffering (the next level's codebook
transfers while the current level computes). The XLA fallback (a lax.scan in
models/quantizer.py) materializes the carry between levels; this kernel keeps
the whole cascade on-chip, which is the fusion called out by the BASELINE
north star ("RVQ codebook nearest-neighbor search" as a Pallas candidate;
SURVEY.md §2.10, §7 stage 3).

Used on the inference/encode path (no codebook updates). Indices are
bit-exact with the scan path: same distance formula (||c||^2 - 2 x.c), same
f32 precision, same first-minimum argmin tie-breaking.

STATUS (round 1, v5e measurement): bit-exact on hardware, but ~8x slower than
the XLA scan path (396 ms vs 48 ms for 4800 frames x 8 levels x 1024 x 512) —
the per-tile level loop leaves the MXU idle between short matmuls. Kept as a
validated alternative (`CausalVQAE(use_pallas_rvq=True)`); the XLA scan
remains the default. TODO(round 2): keep codebooks VMEM-resident across grid
steps (constant index_map), fuse dist+argmin across bigger N tiles, try
bf16 distance with f32 refine.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rvq_kernel(nq: int, S: int, D: int, tile_n: int, x_ref, cnorm_ref, cb_hbm, idx_ref, qsum_ref):
    """One frame tile: x_ref (TILE_N, D) VMEM; cnorm_ref (nq, S) VMEM;
    cb_hbm (nq, S, D) in HBM/ANY; idx_ref (TILE_N, nq); qsum_ref (TILE_N, D)."""

    def body(cb_buf, sems):
        # warm up: start DMA of level 0's codebook
        pltpu.make_async_copy(cb_hbm.at[0], cb_buf.at[0], sems.at[0]).start()

        residual = x_ref[:]
        qsum = jnp.zeros_like(residual)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_n, S), 1)

        for level in range(nq):
            slot = level % 2
            nxt = (level + 1) % 2
            if level + 1 < nq:
                pltpu.make_async_copy(
                    cb_hbm.at[level + 1], cb_buf.at[nxt], sems.at[nxt]
                ).start()
            pltpu.make_async_copy(cb_hbm.at[level], cb_buf.at[slot], sems.at[slot]).wait()
            cb = cb_buf[slot]  # (S, D)

            dots = jax.lax.dot_general(
                residual,
                cb,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (TILE_N, S)
            dist = cnorm_ref[level][None, :] - 2.0 * dots
            idx = jnp.argmin(dist, axis=-1).astype(jnp.int32)  # (TILE_N,)
            idx_ref[:, level] = idx

            one_hot = (col_ids == idx[:, None]).astype(jnp.float32)
            q = jax.lax.dot_general(
                one_hot,
                cb,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            qsum = qsum + q
            residual = residual - q

        qsum_ref[:] = qsum

    pl.run_scoped(
        body,
        cb_buf=pltpu.VMEM((2, S, D), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def rvq_encode(x, codebooks, *, tile_n: int = 256, interpret: bool = False):
    """Fused RVQ encode.

    Args:
      x: (N, D) f32 frames.
      codebooks: (nq, S, D) f32.
      tile_n: frames per kernel instance (multiple of 8).
      interpret: run in interpreter mode (CPU tests).

    Returns (indices (N, nq) int32, quantized_sum (N, D) f32).
    """
    N, D = x.shape
    nq, S, _ = codebooks.shape
    c_norm2 = jnp.sum(codebooks * codebooks, axis=-1)  # (nq, S)

    n_pad = -N % tile_n
    x_padded = jnp.pad(x, ((0, n_pad), (0, 0))) if n_pad else x
    Np = x_padded.shape[0]

    kernel = functools.partial(_rvq_kernel, nq, S, D, tile_n)
    idx, qsum = pl.pallas_call(
        kernel,
        grid=(Np // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # codebooks stay in HBM
        ],
        out_specs=(
            pl.BlockSpec((tile_n, nq), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Np, nq), jnp.int32),
            jax.ShapeDtypeStruct((Np, D), jnp.float32),
        ),
        interpret=interpret,
    )(x_padded, c_norm2, codebooks)
    if n_pad:
        idx, qsum = idx[:N], qsum[:N]
    return idx, qsum
