"""Benchmark: encode+decode throughput of the flagship codec.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Metric (BASELINE.json): audio seconds processed per wall-clock second per
chip for full encode -> RVQ-8 quantize -> decode at 24 kHz. Baseline target:
>= 20x real-time per TPU v5e chip, so vs_baseline = value / 20.
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from audio_generation_tpu.models import CausalVQAE

    sample_rate = 24000
    batch = 8
    seconds_per_clip = 3
    length = sample_rate * seconds_per_clip  # 72000, divisible by 480

    model = CausalVQAE(
        in_channels=1,
        num_quantizers=8,
        codebook_size=1024,
        codebook_dim=512,
        input_format="n c l",
        vq_type="ema",
        use_som=True,
        som_kernel_type="hard",
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, 1, length)).astype(np.float32) * 0.1)
    variables = model.init(jax.random.key(0), x)

    @jax.jit
    def encode_decode(variables, x):
        (y, _commit, indices), _ = model.apply(variables, x, mutable=["codebook"])
        return y, indices

    @jax.jit
    def probe(y, idx):
        # tiny reduction forcing the full computation when transferred
        return jnp.sum(y[:, :, ::1024]) + jnp.sum(idx[:, ::64, :]).astype(jnp.float32)

    # warmup / compile (block via host transfer — block_until_ready can
    # return early through the axon tunnel)
    y, idx = encode_decode(variables, x)
    float(probe(y, idx))

    n_iters = 20
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for _ in range(n_iters):
        y, idx = encode_decode(variables, x)
        acc = acc + probe(y, idx)  # dependency chain: nothing can be skipped
    _ = float(acc)  # forces every iteration to have executed
    elapsed = time.perf_counter() - t0

    latencies = []
    for _ in range(10):
        t1 = time.perf_counter()
        y, idx = encode_decode(variables, x)
        _ = float(probe(y, idx))
        latencies.append(time.perf_counter() - t1)

    audio_seconds = batch * seconds_per_clip * n_iters
    value = audio_seconds / elapsed
    p50_ms = float(np.percentile(latencies, 50) * 1e3)

    print(
        json.dumps(
            {
                "metric": "encode+decode audio sec/s/chip (RVQ-8 @24kHz)",
                "value": round(value, 2),
                "unit": "audio_sec/s",
                "vs_baseline": round(value / 20.0, 3),
                "extra": {
                    "rtf": round(value, 2),
                    "p50_latency_ms": round(p50_ms, 2),
                    "batch": batch,
                    "clip_seconds": seconds_per_clip,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
