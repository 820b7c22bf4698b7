"""Pallas fused-RVQ kernel vs XLA scan: exactness + timing on hardware.

Usage: python tools/bench_rvq.py [n_frames] [iters] [repeats]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from audio_generation_tpu.models.quantizer import ResidualQuantizer
    from audio_generation_tpu.ops.rvq_pallas import rvq_encode

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 4800
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    R = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    D, S, nq = 512, 1024, 8

    q = ResidualQuantizer(num_quantizers=nq, dim=D, codebook_sizes=S, use_som=False)
    state = q.init_state(jax.random.key(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32) * 0.3)

    @jax.jit
    def scan_path(state, flat):
        xq, idx, commit, _ = q(state, flat[None], update_codebook=False)
        return idx[0], xq[0]

    @jax.jit
    def pallas_path(cb, flat):
        return rvq_encode(flat, cb)

    idx_s, xq_s = jax.device_get(scan_path(state, x))
    idx_p, qsum_p = jax.device_get(pallas_path(state.codebooks, x))
    exact = bool((idx_s == idx_p).all())
    # scan returns straight-through x + (qsum - x); compare quantized sums
    qsum_s = xq_s
    max_err = float(np.max(np.abs(qsum_s - qsum_p)))
    print(f"indices bit-exact vs scan: {exact}; qsum max abs err: {max_err:.3e}")

    def timed(name, fn, *args):
        @jax.jit
        def rep(*a):
            def body(i, carry):
                flat, acc = carry
                idx, qs = fn(*a[:-1], flat)
                p = jnp.sum(idx[::64]).astype(jnp.float32) + jnp.sum(qs[::64, ::64])
                return (flat + (p * 0.0).astype(flat.dtype), acc + p)

            _, acc = jax.lax.fori_loop(0, R, body, (a[-1], jnp.float32(0.0)))
            return acc

        float(rep(*args))
        lat = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(rep(*args))
            lat.append(time.perf_counter() - t0)
        p50 = float(np.percentile(lat, 50)) / R * 1e3
        print(f"{name:<36}{p50:>10.3f} ms  ({N} frames x {nq} levels)", flush=True)
        return p50

    t_scan = timed("xla scan (quantizer.py)", lambda flat: scan_path(state, flat), x)
    t_pal = timed("pallas fused (rvq_pallas.py)", lambda flat: pallas_path(state.codebooks, flat), x)
    print(f"speedup pallas vs scan: {t_scan / t_pal:.2f}x")


if __name__ == "__main__":
    main()
