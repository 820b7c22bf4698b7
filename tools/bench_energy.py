"""Inference throughput of the ENERGY codec (bottleneck="energy_rvq").

QUALITY_r04 crowned energy_rvq the quality flagship (+6.2 dB SI-SDR / STOI*
0.93 vs the plain-RVQ codec's -40 dB / 0.74 on PseudoSpeech at 4 kbps), so
the serving question is what its in-bottleneck energy descent (n_iters
jax.grad steps on the latent, models/energy.py) costs at inference.  Same
harness as bench.py (bf16 convs + f32 RVQ search, batch 32 x 3 s @ 24 kHz,
8 in-jit chained calls to amortize the ~25 ms tunnel dispatch, forced host
transfer of an output-dependent probe — `jax.block_until_ready` returns
early through the axon tunnel).

Writes ENERGY_BENCH_r04.json and prints one JSON line per config.

Usage: python tools/bench_energy.py [n_iters_list=8,4,2]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SR, SECONDS, BATCH = 24000, 3, 32


def build(n_iters: int | None):
    import jax
    import jax.numpy as jnp

    from audio_generation_tpu.models import CausalVQAE

    kwargs = {}
    if n_iters is not None:
        kwargs = dict(bottleneck="energy_rvq", energy_kwargs={"n_iters": n_iters})
    model = CausalVQAE(
        in_channels=1,
        num_quantizers=8,
        codebook_size=1024,
        codebook_dim=512,
        input_format="n c l",
        vq_type="ema",
        use_som=True,
        som_kernel_type="hard",
        compute_dtype=jnp.bfloat16,
        **kwargs,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(BATCH, 1, SR * SECONDS)).astype(np.float32) * 0.1
    )
    variables = model.init(jax.random.key(0), x)

    @jax.jit
    def encode_decode(variables, x):
        (y, _commit, indices), _ = model.apply(variables, x, mutable=["codebook"])
        return jnp.sum(y[:, :, ::1024]) + jnp.sum(indices[:, ::64, :]).astype(
            jnp.float32
        )

    R = 8

    @jax.jit
    def rep(variables, x):
        def body(i, carry):
            inp, acc = carry
            p = encode_decode(variables, inp)
            z = jnp.where(jnp.isfinite(p), p, 0.0) * 0.0
            return (inp + z.astype(inp.dtype), acc + p)

        _, acc = jax.lax.fori_loop(0, R, body, (x, jnp.float32(0.0)))
        return acc

    return encode_decode, rep, R, variables, x


def measure(n_iters: int | None, iters=8):
    fn, fn_rep, R, variables, x = build(n_iters)
    float(fn(variables, x))
    float(fn_rep(variables, x))
    lat1, latr = [], []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(variables, x))
        lat1.append(time.perf_counter() - t0)
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn_rep(variables, x))
        latr.append(time.perf_counter() - t0)
    p50 = float(np.percentile(latr, 50)) / R
    return {
        "bottleneck": "rvq" if n_iters is None else f"energy_rvq(n_iters={n_iters})",
        "p50_device_ms": round(p50 * 1e3, 2),
        "p50_single_dispatch_ms": round(float(np.percentile(lat1, 50)) * 1e3, 2),
        "audio_s_per_s": round(BATCH * SECONDS / p50, 1),
        "rtf_vs_20x_target": round(BATCH * SECONDS / p50 / 20.0, 2),
    }


def main():
    import jax

    n_list = (
        [int(s) for s in sys.argv[1].split(",")] if len(sys.argv) > 1 else [8, 4, 2]
    )
    rows = [measure(None)]  # plain-RVQ anchor, same process/harness
    print(json.dumps(rows[-1]), flush=True)
    for n in n_list:
        rows.append(measure(n))
        print(json.dumps(rows[-1]), flush=True)
    out = {
        "config": f"batch {BATCH} x {SECONDS} s @ {SR} Hz, bf16 convs + f32 RVQ",
        "device": str(jax.devices()[0]),
        "rows": rows,
    }
    with open("ENERGY_BENCH_r04.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote ENERGY_BENCH_r04.json")


if __name__ == "__main__":
    main()
