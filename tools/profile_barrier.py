"""Does breaking XLA fusion between decoder blocks recover the isolated-block
speed? The fused decoder tail costs ~2x the same blocks in isolation; this
times the full pipeline with jax.lax.optimization_barrier at block
boundaries vs without.

Usage: python tools/profile_barrier.py [batch] [iters] [repeats]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from audio_generation_tpu.models import CausalVQAE

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    R = int(sys.argv[3]) if len(sys.argv) > 3 else 6

    model = CausalVQAE(
        in_channels=1, num_quantizers=8, codebook_size=1024, codebook_dim=512,
        input_format="n c l", vq_type="ema", use_som=True,
        som_kernel_type="hard", compute_dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, 1, 72000)).astype(np.float32) * 0.1)
    variables = model.init(jax.random.key(0), x)

    def pipeline(m, t, barrier_mode):
        maybe = (
            jax.lax.optimization_barrier
            if barrier_mode in ("dec", "all")
            else (lambda h: h)
        )
        maybe_enc = (
            jax.lax.optimization_barrier if barrier_mode == "all" else (lambda h: h)
        )
        h = m._to_blc(t).astype(m.compute_dtype)
        h = m.enc_stem(h)
        for blk in m.enc_blocks:
            h = maybe_enc(blk(h))
        z = m.enc_out(h)
        zq, idx, commit = m.bottleneck_fn(z)
        h = m.dec_stem(zq.astype(m.compute_dtype))
        for blk in m.dec_blocks:
            h = maybe(blk(h))
        y = m.dec_out(h)
        return y, idx

    for mode in ["none", "dec", "all"]:
        @jax.jit
        def rep(v, a, mode=mode):
            def body(i, carry):
                inp, acc = carry
                (y, idx), _ = model.apply(
                    v, inp, mode, method=pipeline, mutable=["codebook"]
                )
                p = jnp.sum(y[:, ::1024, :].astype(jnp.float32)) + jnp.sum(
                    idx[:, ::64, :]
                ).astype(jnp.float32)
                return (inp + (p * 0.0).astype(inp.dtype), acc + p)

            _, acc = jax.lax.fori_loop(0, R, body, (a, jnp.float32(0.0)))
            return acc

        float(rep(variables, x))
        lat = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(rep(variables, x))
            lat.append(time.perf_counter() - t0)
        p50 = float(np.percentile(lat, 50)) / R * 1e3
        print(f"barriers={mode:<6} fused encode+decode: {p50:9.2f} ms  "
              f"({batch*3/(p50/1e3):.0f} audio-s/s)", flush=True)


if __name__ == "__main__":
    main()
