"""Sub-stage decoder profiling: upsampler vs residual layers, and alternative
upsampler lowerings (phase-decomposed vs naive upsample+conv vs convT).

Usage: python tools/profile_decoder.py [batch] [iters] [repeats]
"""
from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from audio_generation_tpu.ops import conv as C

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    R = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    rng = np.random.default_rng(0)
    rows = []

    def time_repeated(name, f, a):
        @jax.jit
        def rep(a):
            def body(i, carry):
                inp, acc = carry
                out = f(inp)
                p = jnp.sum(out[..., ::37].astype(jnp.float32))
                inp = inp + (p * 0.0).astype(inp.dtype)
                return (inp, acc + p)

            _, acc = jax.lax.fori_loop(0, R, body, (a, jnp.float32(0.0)))
            return acc

        float(rep(a))
        lat = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(rep(a))
            lat.append(time.perf_counter() - t0)
        p50 = float(np.percentile(lat, 50)) / R
        rows.append((name, p50 * 1e3))
        print(f"{name:<56}{p50*1e3:>10.3f} ms", flush=True)

    # ---- the three hot decoder geometries (L_in, Cin, Cout, stride) --------
    geoms = [
        (750, 512, 256, 4),    # dec_block1 geometry (wavelet in the model)
        (3000, 256, 128, 4),   # dec_block2
        (12000, 128, 64, 3),   # dec_block3
        (36000, 64, 32, 2),    # dec_block4
    ]
    dt = jnp.bfloat16

    for L, cin, cout, s in geoms:
        x = jnp.asarray(rng.normal(size=(batch, L, cin)).astype(np.float32) * 0.1).astype(dt)
        k = 2 * s + 1
        w = jnp.asarray(rng.normal(size=(k, cin, cout)).astype(np.float32) * 0.05)
        b = jnp.zeros((cout,), jnp.float32)

        time_repeated(
            f"up phase-decomposed L={L} {cin}->{cout} s={s}",
            lambda t, w=w, b=b, s=s: C.causal_upsample_conv1d(t, w.astype(t.dtype), b.astype(t.dtype), stride=s),
            x,
        )
        time_repeated(
            f"up naive upsample+same_conv L={L} {cin}->{cout} s={s}",
            lambda t, w=w, b=b, s=s: C.same_conv1d(C.upsample_nearest(t, s), w.astype(t.dtype), b.astype(t.dtype)),
            x,
        )
        wt = jnp.asarray(rng.normal(size=(k, cin, cout)).astype(np.float32) * 0.05)
        time_repeated(
            f"up convT L={L} {cin}->{cout} s={s}",
            lambda t, wt=wt, b=b, s=s: C.causal_conv_transpose1d(t, wt.astype(t.dtype), b.astype(t.dtype), stride=s),
            x,
        )

        # residual-layer stack at the OUTPUT shape (3 layers, k=7, dil 1/3/9)
        Lo = L * s
        y = jnp.asarray(rng.normal(size=(batch, Lo, cout)).astype(np.float32) * 0.1).astype(dt)
        ws = [
            (
                jnp.asarray(rng.normal(size=(7, cout, cout)).astype(np.float32) * 0.05).astype(dt),
                jnp.asarray(rng.normal(size=(1, cout, cout)).astype(np.float32) * 0.05).astype(dt),
            )
            for _ in range(3)
        ]

        def res_stack(t, ws=ws):
            for i, (w1, w2) in enumerate(ws):
                h = C.causal_conv1d(t, w1, dilation=3**i)
                h = jax.nn.leaky_relu(h, 0.1)
                h = C.causal_conv1d(t=h, w=w2) if False else C.causal_conv1d(h, w2)
                t = t + h
                t = jax.nn.leaky_relu(t, 0.1)
            return t

        time_repeated(f"res x3 (k7 d1/3/9 + k1) L={Lo} C={cout}", res_stack, y)

    total = sum(r[1] for r in rows)
    print(f"{'TOTAL':<56}{total:>10.2f} ms")


if __name__ == "__main__":
    main()
