"""Per-strategy microbench of the HOT dilated causal convs (round-3 perf).

tools/flop_audit.py shows ~90% of the lane-fold FLOP overhead (x1.55 whole-
model) concentrates in the d=3/d=9 residual convs of the C=32@72k and
C=64@36k stages: the folded kernel issues 2.9-8.6x the true MACs there.
Three exact execution strategies for causal stride-1 dilated conv:

  folded   current default: fold_time layout, dense folded kernel
           (ops/conv.py folded_causal_conv1d) — 100% lane density,
           kf*f/k FLOP blowup (8.57x at C=32 d=9 f=4)
  unfold   free reshape out of the folded layout (fold_time is a pure
           row-major reshape), plain dilated conv at C lanes — 1x FLOPs,
           C/128 lane density
  poly     polyphase-in-time: t = m*d + i; subsequence i is a d=1 causal
           conv => transpose phases into batch (real data movement), then
           the folded d=1 conv (1.71x FLOPs at full density) + inverse

All three are bit-identical math (same tap sums, f32) — this tool asserts
closeness then times them inside ONE jit with R chained repeats (tunnel-safe,
bench.py pattern).

Usage: python tools/bench_dilated.py  (needs TPU; PYTHONPATH=/root/repo)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from audio_generation_tpu.ops.conv import (
        causal_conv1d,
        fold_time,
        folded_causal_conv1d,
        unfold_time,
    )

    B, k = 32, 7
    R = 8
    iters = 10
    cases = [
        (72000, 32, 4, 3),
        (72000, 32, 4, 9),
        (36000, 64, 2, 3),
        (36000, 64, 2, 9),
    ]

    def poly_conv(x, w, b, d, f):
        bb, L, c = x.shape
        assert L % d == 0
        xp = x.reshape(bb, L // d, d, c).transpose(0, 2, 1, 3).reshape(bb * d, L // d, c)
        xp = fold_time(xp, f) if (L // d) % f == 0 else xp
        fp = f if (L // d) % f == 0 else 1
        y = folded_causal_conv1d(xp, w, b, fold=fp, dilation=1)
        y = unfold_time(y, fp, w.shape[2])
        return y.reshape(bb, d, L // d, -1).transpose(0, 2, 1, 3).reshape(bb, L, -1)

    def strategies(w, b, d, f):
        from audio_generation_tpu.ops.conv import aligned_dilated_conv1d

        out = {
            "folded": lambda xf: folded_causal_conv1d(xf, w, b, fold=f, dilation=d),
            "unfold": lambda xf: fold_time(
                causal_conv1d(unfold_time(xf, f, w.shape[1]), w, b, dilation=d), f
            ),
            "poly": lambda xf: fold_time(
                poly_conv(unfold_time(xf, f, w.shape[1]), w, b, d, f), f
            ),
        }
        if d > 1:
            out["aligned"] = lambda xf: fold_time(
                aligned_dilated_conv1d(unfold_time(xf, f, w.shape[1]), w, b, dilation=d),
                f,
            )
        return out

    rng = np.random.default_rng(0)
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else None
    print(f"B={B} k={k} bf16, {iters} iters x {R} in-jit repeats, p50 ms")
    for L, C, f, d in cases:
        w = jnp.asarray(rng.normal(size=(k, C, C)).astype(np.float32) * 0.05)
        b = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.01)
        x = jnp.asarray(rng.normal(size=(B, L, C)).astype(np.float32) * 0.1)
        xf = fold_time(x, f)

        # sanity check (loose: on the axon TPU, f32 convs disagree at ~2e-3
        # rel between lowerings — HIGHEST is not bit-faithful there for at
        # least one of these conv forms. Bit-level equality of the three
        # strategies is asserted on CPU in tests/test_conv_ops.py.)
        fns = strategies(w, b, d, f)
        if only:
            fns = {n: f_ for n, f_ in fns.items() if n in only}
        ref = np.asarray(next(iter(fns.values()))(xf), dtype=np.float64)
        for name, fn_ in fns.items():
            got = np.asarray(fn_(xf), dtype=np.float64)
            rel = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-9)
            assert rel < 1e-2, (name, L, C, d, rel)

        # timed bf16
        wb, bb16, xb = w.astype(jnp.bfloat16), b.astype(jnp.bfloat16), xf.astype(jnp.bfloat16)
        fns16 = strategies(wb, bb16, d, f)
        if only:
            fns16 = {n: f_ for n, f_ in fns16.items() if n in only}
        row = {}
        for name, fn in fns16.items():
            @jax.jit
            def rep(xin, fn=fn):
                def body(i, carry):
                    inp, acc = carry
                    y = fn(inp)
                    p = jnp.sum(y[:, ::512, ::16]).astype(jnp.float32)
                    z = jnp.where(jnp.isfinite(p), p, 0.0) * 0.0
                    return (inp + z.astype(inp.dtype), acc + p)

                return jax.lax.fori_loop(0, R, body, (xin, jnp.float32(0.0)))[1]

            float(rep(xb))  # compile+warm
            ts = []
            for _ in range(iters):
                t0 = time.perf_counter()
                float(rep(xb))
                ts.append((time.perf_counter() - t0) / R)
            row[name] = float(np.median(ts)) * 1e3
        print(f"L={L} C={C} d={d:1d}  " + "  ".join(f"{n}={v:7.3f}" for n, v in row.items()))


if __name__ == "__main__":
    main()
