"""Fused residual-VQ encode kernel (Pallas/TPU).

The whole RVQ cascade — per level: distances (MXU matmul) -> argmin ->
one-hot dequantize (MXU matmul) -> residual subtract — runs on-chip with the
residual held in VMEM across all levels. The XLA fallback (a lax.scan in
models/quantizer.py) materializes the (N, D) carry and the (N, S) one-hot in
HBM between levels; this kernel keeps the cascade resident, which is the
fusion called out by the BASELINE north star ("RVQ codebook nearest-neighbor
search" as a Pallas candidate; SURVEY.md §2.10, §7 stage 3).

Design (round 2 — the round-1 kernel was 8x SLOWER than the scan):
  * grid = (frame_tiles, levels) with the LEVEL axis innermost. The codebook
    block spec maps grid step (i, l) -> codebook l, so the Pallas pipeline
    double-buffers each level's (S, D) codebook across grid steps
    automatically — no hand-rolled DMA, and the NEXT level's codebook
    streams from HBM while the current level computes.
  * The frame tile x (tile_n, D) maps to the same block for all l, so it
    stays VMEM-resident across the level loop (consecutive-revisit rule).
  * The running residual lives in a VMEM scratch buffer, which persists
    across grid steps (the TPU grid is a sequential loop on one core).
  * The quantized sum accumulates in the OUTPUT block (same block for all l,
    one HBM writeback per frame tile), in scan order (((q0+q1)+q2)+...) so
    the result is bit-exact vs the lax.scan path.
  * indices are written as (levels, N) rows — one lane-contiguous row per
    grid step — instead of the round-1 kernel's strided column writes into a
    (tile_n, nq) block (8-lane masked stores, a measured bottleneck).

Used on the inference/encode path (no codebook updates). Indices are
bit-exact with the scan path: same distance formula (||c||^2 - 2 x.c), same
f32 HIGHEST-precision matmuls, same first-minimum argmin tie-breaking.
Assumes uniform codebook sizes (the flagship config): per-level size masks
are not applied.

Measured (v5e, 4800 frames x 8 levels x 1024 x 512, f32, dispatch-amortized):
round-1 kernel 396 ms; this kernel 5.8 ms (tile_n 256: 5.7; 1024 exceeds
VMEM); XLA scan 5.5 ms. CONCLUSION: the redesign recovers the 68x the
round-1 kernel left on the table, landing at parity with the scan — both are
bound by the same f32 HIGHEST-precision distance/dequantize matmuls, i.e.
XLA already compiles the scan to the fused optimum. The scan stays the
default (it also serves the training path with codebook updates); the kernel
remains as the validated fused alternative (`CausalVQAE(use_pallas_rvq=True)`).

Round 3 also tried the remaining idea — bf16 first-pass distances + exact
f32 re-rank of the top-k candidates (tools/rvq_2pass_experiment.py,
RVQ2PASS_r03.json): indices agreed 100% at k>=4, but the 2-pass path is
0.2-0.8x the scan's speed at N = 4800 and 38400 — `lax.top_k` (sort-based on
TPU) plus the (N, k, D) candidate gather cost more than the ~6x matmul-rate
saving. CONCLUSION: the f32-HIGHEST scan is the practical optimum for this
codebook geometry; no further kernel work planned.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rvq_kernel(nq: int, S: int, D: int, tile_n: int,
                x_ref, cb_ref, cnorm_ref, idx_ref, qsum_ref, res_ref):
    """Grid step (i, l): frame tile i, cascade level l.

    x_ref     (tile_n, D) VMEM — resident across the level loop
    cb_ref    (1, S, D)   VMEM — level l's codebook (pipeline double-buffered)
    cnorm_ref (nq, S)     VMEM — precomputed ||c||^2, all levels (32 KB)
    idx_ref   (nq, tile_n) VMEM out — indices for tile i (row l written per step)
    qsum_ref  (tile_n, D) VMEM out — accumulated quantized sum for tile i
    res_ref   (tile_n, D) VMEM scratch — running residual
    """
    l = pl.program_id(1)

    @pl.when(l == 0)
    def _():
        res_ref[:] = x_ref[:]
        qsum_ref[:] = jnp.zeros_like(qsum_ref)

    residual = res_ref[:]
    cb = cb_ref[0]  # (S, D)

    dots = jax.lax.dot_general(
        residual, cb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (tile_n, S)
    dist = cnorm_ref[pl.ds(l, 1), :] - 2.0 * dots  # (tile_n, S) via broadcast
    idx = jnp.argmin(dist, axis=-1).astype(jnp.int32)  # (tile_n,)
    idx_ref[pl.ds(l, 1), :] = idx[None, :]

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_n, S), 1)
    one_hot = (col_ids == idx[:, None]).astype(jnp.float32)
    q = jax.lax.dot_general(
        one_hot, cb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (tile_n, D)
    qsum_ref[:] = qsum_ref[:] + q
    res_ref[:] = residual - q


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def rvq_encode(x, codebooks, *, tile_n: int = 512, interpret: bool = False):
    """Fused RVQ encode.

    Args:
      x: (N, D) f32 frames.
      codebooks: (nq, S, D) f32 (uniform sizes; no per-level masking).
      tile_n: frames per kernel instance (multiple of 8; VMEM-sized).
      interpret: run in interpreter mode (CPU tests).

    Returns (indices (N, nq) int32, quantized_sum (N, D) f32), bit-exact vs
    the models/quantizer.py scan path on the same device.
    """
    N, D = x.shape
    nq, S, _ = codebooks.shape
    c_norm2 = jnp.sum(codebooks * codebooks, axis=-1)  # (nq, S)

    n_pad = -N % tile_n
    x_padded = jnp.pad(x, ((0, n_pad), (0, 0))) if n_pad else x
    Np = x_padded.shape[0]

    kernel = functools.partial(_rvq_kernel, nq, S, D, tile_n)
    idx_t, qsum = pl.pallas_call(
        kernel,
        grid=(Np // tile_n, nq),
        in_specs=[
            pl.BlockSpec((tile_n, D), lambda i, l: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), lambda i, l: (l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, S), lambda i, l: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((nq, tile_n), lambda i, l: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, D), lambda i, l: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nq, Np), jnp.int32),
            jax.ShapeDtypeStruct((Np, D), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((tile_n, D), jnp.float32)],
        interpret=interpret,
    )(x_padded, codebooks, c_norm2)
    idx = idx_t.T  # (Np, nq)
    if n_pad:
        idx, qsum = idx[:N], qsum[:N]
    return idx, qsum
