"""Bisect the decoder-block overhead: flax block vs raw-ops chain.

The per-stage model profile showed dec blocks ~2.5x slower than the sum of
their isolated components. This times, at the dec_block4 geometry:
  (a) the flax CausalDecoderBlock (weight-normed convs)
  (b) a raw-ops chain with the same math (phase-decomposed upsampler)
  (c) the raw-ops chain with the convT upsampler
  (d) one flax CausalConv1d vs raw ops conv (weight-norm isolation)
  (e) the flax WaveletLayer at the dec_block1 geometry

Usage: python tools/profile_decblock.py [batch] [iters] [repeats]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from audio_generation_tpu.models.blocks import CausalDecoderBlock
    from audio_generation_tpu.models.wavelets import WaveletLayer
    from audio_generation_tpu.models.layers import CausalConv1d
    from audio_generation_tpu.ops import conv as C

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    R = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    def time_repeated(name, f, a):
        @jax.jit
        def rep(a):
            def body(i, carry):
                inp, acc = carry
                out = f(inp)
                p = jnp.sum(out[..., ::37].astype(jnp.float32))
                return (inp + (p * 0.0).astype(inp.dtype), acc + p)

            _, acc = jax.lax.fori_loop(0, R, body, (a, jnp.float32(0.0)))
            return acc

        float(rep(a))
        lat = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(rep(a))
            lat.append(time.perf_counter() - t0)
        print(f"{name:<56}{float(np.percentile(lat, 50))/R*1e3:>10.3f} ms", flush=True)

    # ---- dec_block4 geometry: (32, 36000, 64) -> (32, 72000, 32) ----------
    L, cin, cout, s = 36000, 64, 32, 2
    x = jnp.asarray(rng.normal(size=(batch, L, cin)).astype(np.float32) * 0.1).astype(dt)

    block = CausalDecoderBlock(out_channels=cout, stride=s, n_layers=4)
    v = jax.jit(block.init)(jax.random.key(0), x)
    time_repeated("(a) flax CausalDecoderBlock 36000x64->32 s2",
                  lambda t: block.apply(v, t), x)

    k = 2 * s + 1
    wu = jnp.asarray(rng.normal(size=(k, cin, cout)).astype(np.float32) * 0.05)
    ws = [
        (
            jnp.asarray(rng.normal(size=(7, cout, cout)).astype(np.float32) * 0.05).astype(dt),
            jnp.asarray(rng.normal(size=(1, cout, cout)).astype(np.float32) * 0.05).astype(dt),
        )
        for _ in range(3)
    ]

    def ops_chain(t, up):
        h = up(t)
        h = jax.nn.leaky_relu(h, 0.1)
        for i, (w1, w2) in enumerate(ws):
            r = C.causal_conv1d(h, w1, dilation=3**i)
            r = jax.nn.leaky_relu(r, 0.1)
            r = C.causal_conv1d(r, w2)
            h = h + r
            h = jax.nn.leaky_relu(h, 0.1)
        return h

    time_repeated("(b) ops chain w/ phase-decomposed up",
                  lambda t: ops_chain(t, lambda u: C.causal_upsample_conv1d(u, wu.astype(u.dtype), stride=s)), x)
    time_repeated("(c) ops chain w/ convT up",
                  lambda t: ops_chain(t, lambda u: C.causal_conv_transpose1d(u, wu.astype(u.dtype), stride=s)), x)

    # ---- weight-norm isolation at 72000 x 32 -------------------------------
    y = jnp.asarray(rng.normal(size=(batch, 72000, cout)).astype(np.float32) * 0.1).astype(dt)
    conv_wn = CausalConv1d(features=cout, kernel_size=7, dilation=1, norm="weight")
    vw = jax.jit(conv_wn.init)(jax.random.key(0), y)
    time_repeated("(d1) flax CausalConv1d k7 32->32 (weight-norm)",
                  lambda t: conv_wn.apply(vw, t), y)
    conv_nn = CausalConv1d(features=cout, kernel_size=7, dilation=1, norm="none")
    vn = jax.jit(conv_nn.init)(jax.random.key(0), y)
    time_repeated("(d2) flax CausalConv1d k7 32->32 (norm none)",
                  lambda t: conv_nn.apply(vn, t), y)
    w7 = jnp.asarray(rng.normal(size=(7, cout, cout)).astype(np.float32) * 0.05).astype(dt)
    time_repeated("(d3) raw ops causal_conv1d k7 32->32",
                  lambda t: C.causal_conv1d(t, w7), y)

    # ---- wavelet layer at dec_block1 geometry ------------------------------
    zw = jnp.asarray(rng.normal(size=(batch, 750, 512)).astype(np.float32) * 0.1).astype(dt)
    wl = WaveletLayer(hidden_channels=256 * 4, out_channels=256, scale_factor=4,
                      wavelet_kernel_size=9, n_points=2 * 4 * 4)
    vwl = jax.jit(wl.init)(jax.random.key(0), zw)
    time_repeated("(e) flax WaveletLayer 750x512->3000x256 s4",
                  lambda t: wl.apply(vwl, t), zw)


if __name__ == "__main__":
    main()
