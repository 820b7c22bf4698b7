"""Ablation profile of the FUSED encode+decode call: run the pipeline up to
progressively deeper stages, all inside one jit with R data-dependent repeats.
Differences between consecutive variants = the fused cost of each stage —
immune to the per-stage-jit layout/dispatch artifacts that distorted
profile_codec.py's decoder numbers.

Usage: python tools/profile_ablate.py [batch] [iters] [repeats]
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

    from audio_generation_tpu.models import CausalVQAE

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    R = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    length = 72000

    model = CausalVQAE(
        in_channels=1, num_quantizers=8, codebook_size=1024, codebook_dim=512,
        input_format="n c l", vq_type="ema", use_som=True,
        som_kernel_type="hard", compute_dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, 1, length)).astype(np.float32) * 0.1)
    variables = model.init(jax.random.key(0), x)

    def pipeline_until(m, t, stage):
        """stage: 0=encode, 1=+rvq, 2=+dec_stem, 3..7=+dec_block0..4, 8=+dec_out."""
        h = m._to_blc(t).astype(m.compute_dtype)
        h = m.enc_stem(h)
        for blk in m.enc_blocks:
            h = blk(h)
        z = m.enc_out(h)
        if stage == 0:
            return z
        zq, idx, commit = m.bottleneck_fn(z)
        if stage == 1:
            return zq
        h = m.dec_stem(zq.astype(m.compute_dtype))
        for j in range(min(stage - 2, m.n_blocks)):
            h = m.dec_blocks[j](h)
        if stage - 2 <= m.n_blocks:
            return h
        return m.dec_out(h)

    names = (
        ["encode", "+rvq", "+dec_stem"]
        + [f"+dec_block{j}" for j in range(model.n_blocks)]
        + ["+dec_out"]
    )
    prev = 0.0
    print(f"batch={batch} ({iters} iters x {R} repeats, p50 ms, cumulative fused)")
    for stage, name in enumerate(names):
        @jax.jit
        def rep(v, a, stage=stage):
            def body(i, carry):
                inp, acc = carry
                out, _ = model.apply(
                    v, inp, stage, method=pipeline_until, mutable=["codebook"]
                )
                p = jnp.sum(out[..., ::37].astype(jnp.float32))
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
        print(f"{name:<16}{p50:>10.2f} ms   (+{p50-prev:>7.2f})", flush=True)
        prev = p50


if __name__ == "__main__":
    main()
