"""Fused residual-stack Pallas kernel for the codec's dilated-conv stacks.

WHY: the encoder/decoder residual stacks (reference: networks/vae.py:91-148 —
three blocks of [dilated conv k=7 -> LeakyReLU(0.1) -> 1x1 conv -> residual
add] with an inter-block LeakyReLU) are the measured hot path of inference
(CLAUDE.md round-2 ablation: the decoder tail is ~80% of encode+decode time).
Under XLA each of the six convs per stack is its own HBM round trip — the
pointwise convs and residual adds are bandwidth-bound at the low-channel,
high-rate stages, and XLA cannot fuse *across* convolution boundaries. This
kernel keeps the whole stack resident in VMEM: HBM is touched once on the way
in and once on the way out (plus the small halo), with the same folded-matmul
math the XLA path uses (ops/conv.py fold_time law), so the FLOP count is
unchanged and parity is exact up to accumulation-order rounding.

Execution model
---------------
The input is the lane-folded activation (B, Lf, lanes) with
lanes = fold * channels (fold chosen by the blocks so lanes is a multiple of
the 128-wide TPU lane dimension). The grid is (B, num_tiles); tile i computes
output rows [i*T, (i+1)*T).

Each stage's causal conv is a sum of shifted matmuls:

  fold > 1:  y[u] = sum_s  h[u - (kpp-1) + s] @ Wf[s]      (folded kernel,
             kpp = ceil(d*(k-1)/fold) + 1 taps of (lanes, lanes); exactly
             ops.conv._fold_matrix — the dense form XLA compiles to peak,
             see the round-3 dilated-conv study in CLAUDE.md)
  fold == 1: y[u] = sum_j  h[u - d*(k-1) + d*j] @ w[j]     (k true taps of
             (C, C); no folded blowup needed once C >= 128 lanes)

History ("halo") handling: producing T valid rows of the final stage needs
H = sum_over_stages(reach) input rows of history, reach = kpp-1 (folded) or
d*(k-1) (unfolded). Instead of overlapping DMAs, the kernel carries the last
H rows of tile i's input block in a persistent VMEM scratch and splices them
in front of tile i+1's block — the grid runs tiles sequentially, so Pallas's
automatic double-buffering of the blocked input/output specs provides the
compute/DMA overlap and no manual copies from HBM are needed.

Causal zero-history: for tile 0 the halo is zeros (the conv pad law,
ops/conv.py:48-54), and after every stage the H "negative time" rows are
re-zeroed — each conv pads ITS OWN input with zeros, so the bias response of
stage j at t < 0 must not leak into stage j+1 (the same warmup transient the
streaming runtime masks, streaming.py). For interior tiles the prefix rows
are real history; stage j's outputs there are correct only from row
sum(reach_0..j) on, which is exactly why H is the *sum* of the reaches: the
garbage margin shrinks by one reach per stage and the written rows [H, H+T)
of the final stage are always valid.

Gradients: `fused_residual_stack` is wrapped in jax.custom_vjp — forward is
the kernel, backward differentiates the equivalent XLA path
(`residual_stack_xla`), recomputing the forward from the saved (x, weights)
residuals (checkpoint-style, so activation memory matches remat_blocks).
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audio_generation_tpu.ops.activations import leaky_relu
from audio_generation_tpu.ops.conv import _fold_matrix, folded_causal_conv1d

NEG_SLOPE = 0.1  # the generator's LeakyReLU slope (reference networks/vae.py)


def _lrelu_mosaic(x, negative_slope):
    """leaky_relu in a Mosaic-legal form for in-kernel use.

    `jnp.where(x >= 0, ...)` lowers to `arith.cmpf` on the compute dtype and
    Mosaic rejects bf16 vector comparisons on v5e ("Target does not support
    this comparison" — the round-4 STACK_BENCH failure). max/min need no
    comparison result type and compile. Value-equal to ops.activations.
    leaky_relu for every finite x: x >= 0 -> max=x, min=0, x + s*0 = x;
    x < 0 -> max=0, min=x, 0 + s*x = s*x (adding a true zero is exact in
    any float dtype, so kernel-vs-XLA parity stays bit-exact)."""
    return jnp.maximum(x, 0) + negative_slope * jnp.minimum(x, 0)


def residual_stack_xla(x, blocks, *, fold: int, dilations: Sequence[int]):
    """The stack as the existing XLA ops compute it (CausalResidualBlock1d +
    the inter-block activation, models/blocks.py:36-81,110-119). Used as the
    parity reference and as the backward path of the custom VJP."""
    dt = x.dtype
    h = x
    for (w1, b1, w2, b2), d in zip(blocks, dilations):
        a = folded_causal_conv1d(
            h, w1.astype(dt), b1.astype(dt), fold=fold, dilation=int(d)
        )
        a = leaky_relu(a, NEG_SLOPE)
        r = folded_causal_conv1d(a, w2.astype(dt), b2.astype(dt), fold=fold)
        h = leaky_relu(h + r, NEG_SLOPE)
    return h


def _stage_plan(blocks, fold: int, dilations, dtype):
    """Trace-time weight preparation. Returns (arrays, stage_meta, H, PAD):
    arrays is the flat list of kernel operands; each stage_meta is
    (n_taps, tap_stride, reach) for the dilated conv (the pointwise conv is
    always a single tap). Folding mirrors folded_causal_conv1d bit-for-bit:
    cast the canonical weight to the compute dtype first (as CausalConv1d
    does), fold in f32, cast the folded kernel back."""
    arrays, meta = [], []
    H = 0
    PAD = 0
    for (w1, b1, w2, b2), d in zip(blocks, dilations):
        d = int(d)
        k, cin, cout = w1.shape
        assert cin == cout, "residual stack is channel-preserving"
        if fold > 1:
            M, _, kpp = _fold_matrix(k, d, fold)
            wq = w1.astype(dtype)
            wf = jnp.einsum(
                "isrj,jco->iscro", jnp.asarray(M), wq.astype(jnp.float32)
            ).reshape(kpp, fold * cin, fold * cout).astype(dtype)
            bias1 = jnp.tile(b1.astype(dtype), fold)[None, :]
            n_taps, stride, reach = kpp, 1, kpp - 1
        else:
            wf = w1.astype(dtype)  # (k, C, C): per-tap matmul at stride d
            bias1 = b1.astype(dtype)[None, :]
            n_taps, stride, reach = k, d, d * (k - 1)
        # pointwise conv folded: block-diagonal (lanes, lanes); built with
        # the same fold law so the arithmetic matches the XLA path
        if fold > 1:
            M1, _, _ = _fold_matrix(1, 1, fold)
            wq2 = w2.astype(dtype)
            wp = jnp.einsum(
                "isrj,jco->iscro", jnp.asarray(M1), wq2.astype(jnp.float32)
            ).reshape(fold * cin, fold * cout).astype(dtype)
            bias2 = jnp.tile(b2.astype(dtype), fold)[None, :]
        else:
            wp = w2.astype(dtype)[0]
            bias2 = b2.astype(dtype)[None, :]
        arrays += [wf, bias1, wp, bias2]
        meta.append((n_taps, stride, reach))
        H += reach
        PAD = max(PAD, reach)
    return arrays, meta, H, PAD


def _kernel(meta, H, PAD, T, lanes, dtype, n_stages, x_ref, *refs):
    w_refs = refs[: 4 * n_stages]
    out_ref = refs[4 * n_stages]
    bufa, bufb, halo = refs[4 * n_stages + 1 :]
    i = pl.program_id(1)
    N = T + H
    acc_t = jnp.float32
    # Repo dtype convention (CLAUDE.md): f32 ops run Precision.HIGHEST
    # (bit-stable goldens), bf16 runs DEFAULT. Without this the kernel's f32
    # dots lowered to fast low-precision MXU passes — round-5's first f32
    # A/B showed wave_rel_err 3.4e-4 and a 1.78x "win" that was partly a
    # silent precision downgrade vs the HIGHEST-precision XLA path.
    prec = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None

    @pl.when(i == 0)
    def _():
        if PAD > 0:  # static: zero the tap-overhang region once per batch row
            bufa[:PAD] = jnp.zeros((PAD, lanes), dtype)
            bufb[:PAD] = jnp.zeros((PAD, lanes), dtype)
        if H > 0:
            bufa[PAD : PAD + H] = jnp.zeros((H, lanes), dtype)

    @pl.when(i > 0)
    def _():
        if H > 0:
            bufa[PAD : PAD + H] = halo[:]

    bufa[PAD + H : PAD + N] = x_ref[0]
    if H > 0:  # carry this tile's input tail as the next tile's history
        halo[:] = x_ref[0, T - H : T, :]

    src, dst = bufa, bufb
    for s_idx in range(n_stages):
        n_taps, stride, reach = meta[s_idx]
        wf, b1, wp, b2 = w_refs[4 * s_idx : 4 * s_idx + 4]
        acc = jnp.zeros((N, lanes), acc_t)
        for t in range(n_taps):
            lo = PAD - reach + t * stride
            acc = acc + jnp.dot(
                src[lo : lo + N], wf[t], preferred_element_type=acc_t,
                precision=prec,
            )
        a = _lrelu_mosaic(acc.astype(dtype) + b1[0], NEG_SLOPE)
        r = jnp.dot(
            a, wp[:], preferred_element_type=acc_t, precision=prec
        ).astype(dtype)
        h = _lrelu_mosaic(src[PAD : PAD + N] + (r + b2[0]), NEG_SLOPE)
        dst[PAD : PAD + N] = h

        @pl.when(i == 0)
        def _():
            if H > 0:  # re-zero t<0: each conv zero-pads its OWN input
                dst[PAD : PAD + H] = jnp.zeros((H, lanes), dtype)

        src, dst = dst, src

    out_ref[0] = src[PAD + H : PAD + N]


def _pick_tile(lf: int, lanes: int, dtype=None) -> int:
    # Tile budget: ins/outs are double-buffered, weights + two ping-pong
    # scratch buffers + the f32 accumulator temporaries all live in VMEM.
    # 4096*128 lane-elements (T=3600 at lanes=128) compiled standalone and
    # at b8, but the b32 model graph hit the 16 MiB scoped-vmem limit at
    # 19.38 MiB (XLA shares scoped vmem with neighbouring fusions) — halve
    # the budget; the kernel is HBM-bound, so smaller tiles keep the win.
    # f32 runs Precision.HIGHEST (repo policy), which Mosaic lowers to a
    # multi-pass decomposition with ~5x the stack temporaries (measured:
    # 36.2 MiB at T=2000) — shrink its budget a further ~2.7x.
    budget = 768 if dtype == jnp.float32 else 2048
    cap = max(256, (budget * 128) // lanes)
    if lf <= cap:
        return lf  # single tile: block == array is always Mosaic-legal
    # Mosaic requires ANY time-block smaller than the full array dim to be a
    # multiple of 8 sublanes — block == array is the only exemption (the
    # first real-TPU run rejected 1500 of 3000: an exact divisor, no partial
    # block, yet still refused because 1500 % 8 != 0).
    # Prefer the largest multiple-of-8 divisor (no host-side padding); else
    # any tile works because _forward pads lf up to a multiple of T.
    for t in range(cap - cap % 8, 255, -8):
        if lf % t == 0:
            return t
    return cap - cap % 8


def _forward(x, blocks, *, fold, dilations, tile=None, interpret=None):
    b, lf, lanes = x.shape
    arrays, meta, H, PAD = _stage_plan(blocks, fold, dilations, x.dtype)
    T = _pick_tile(lf, lanes, x.dtype) if tile is None else min(tile, lf)
    T = max(T, H)  # a tile must cover the stack history it carries forward
    if T < lf:  # Mosaic sublane law: a partial block must be 8-aligned
        T = min(-8 * (-T // 8), lf)
    pad_rows = (-lf) % T
    xp = jnp.pad(x, ((0, 0), (0, pad_rows), (0, 0))) if pad_rows else x
    lfp = lf + pad_rows
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_stages = len(meta)
    kern = functools.partial(
        _kernel, tuple(meta), H, PAD, T, lanes, x.dtype, n_stages
    )
    y = pl.pallas_call(
        kern,
        grid=(b, lfp // T),
        in_specs=[pl.BlockSpec((1, T, lanes), lambda bi, ti: (bi, ti, 0))]
        + [
            pl.BlockSpec(a.shape, lambda bi, ti, nd=a.ndim: (0,) * nd)
            for a in arrays
        ],
        out_specs=pl.BlockSpec((1, T, lanes), lambda bi, ti: (bi, ti, 0)),
        out_shape=jax.ShapeDtypeStruct((b, lfp, lanes), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((PAD + T + H, lanes), x.dtype),
            pltpu.VMEM((PAD + T + H, lanes), x.dtype),
            pltpu.VMEM((max(H, 1), lanes), x.dtype),
        ],
        interpret=interpret,
    )(xp, *arrays)
    return y[:, :lf] if pad_rows else y


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _stack_ad(fold, dilations, tile, x, blocks):
    return _forward(x, blocks, fold=fold, dilations=dilations, tile=tile)


def _stack_fwd(fold, dilations, tile, x, blocks):
    return _stack_ad(fold, dilations, tile, x, blocks), (x, blocks)


def _stack_bwd(fold, dilations, tile, res, g):
    x, blocks = res
    _, vjp = jax.vjp(
        lambda x_, blocks_: residual_stack_xla(
            x_, blocks_, fold=fold, dilations=dilations
        ),
        x,
        blocks,
    )
    return vjp(g)


_stack_ad.defvjp(_stack_fwd, _stack_bwd)


def fused_residual_stack(x, blocks, *, fold: int, dilations, tile=None):
    """Run the whole residual stack as one Pallas kernel.

    x: (B, Lf, fold*C) in the fold_time layout (fold=1 means unfolded with
    C >= 128). blocks: per residual block, (w1, b1, w2, b2) in the CANONICAL
    param shapes (k, C, C), (C,), (1, C, C), (C,) — folding happens here, so
    checkpoints/parity are untouched. dilations: per-block dilation (the
    codec uses 3**i). Differentiable (custom VJP via the XLA path)."""
    blocks = tuple(tuple(blk) for blk in blocks)
    return _stack_ad(int(fold), tuple(int(d) for d in dilations), tile, x, blocks)
