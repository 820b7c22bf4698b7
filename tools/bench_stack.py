"""TPU A/B bench + parity gate for the fused residual-stack Pallas kernel.

Compares the flagship codec's encode+decode with `use_pallas_stack` off/on
(ops/stack_pallas.py: the whole dilated stack VMEM-resident, one HBM round
trip instead of one per conv — targets the round-2 finding that the decoder
tail is ~80% of inference and is lane/bandwidth-bound, CLAUDE.md).

Writes STACK_BENCH_r05.json:
  - TPU parity: RVQ indices bit-equal, waveform relative error
  - p50 device ms (8 in-jit chained calls, tunnel dispatch amortized, same
    probe-forcing law as bench.py) for bf16 b32x3s and f32 b8x3s
  - speedup per config

Run on an idle TPU only (never overlap remote compiles, CLAUDE.md).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(dtype, batch, length, pallas_stack):
    import jax
    import jax.numpy as jnp

    from audio_generation_tpu.models import CausalVQAE

    model = CausalVQAE(
        in_channels=1,
        num_quantizers=8,
        codebook_size=1024,
        codebook_dim=512,
        input_format="n c l",
        vq_type="ema",
        use_som=True,
        som_kernel_type="hard",
        compute_dtype=dtype,
        use_pallas_stack=pallas_stack,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, 1, length)).astype(np.float32) * 0.1)
    variables = model.init(jax.random.key(0), x)

    @jax.jit
    def full(variables, x):
        (y, _commit, indices), _ = model.apply(variables, x, mutable=["codebook"])
        return y, indices

    @jax.jit
    def probe(variables, x):
        y, indices = full(variables, x)
        return jnp.sum(y[:, :, ::1024]) + jnp.sum(indices[:, ::64, :]).astype(
            jnp.float32
        )

    R = 8

    @jax.jit
    def rep(variables, x):
        def body(i, carry):
            inp, acc = carry
            p = probe(variables, inp)
            z = jnp.where(jnp.isfinite(p), p, 0.0) * 0.0
            return (inp + z.astype(inp.dtype), acc + p)

        _, acc = jax.lax.fori_loop(0, R, body, (x, jnp.float32(0.0)))
        return acc

    return full, probe, rep, R, variables, x


def p50_ms(fn, variables, x, n_iters, R=1):
    float(fn(variables, x))  # compile + warmup
    lat = []
    for _ in range(n_iters):
        t0 = time.perf_counter()
        _ = float(fn(variables, x))
        lat.append(time.perf_counter() - t0)
    return float(np.percentile(lat, 50)) * 1e3 / R


def run_config(dtype_name, batch, length, n_iters):
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    out = {"config": f"{dtype_name} b{batch} x {length} samples"}
    full0, probe0, rep0, R, v0, x = build(dtype, batch, length, False)
    out["p50_xla_ms"] = round(p50_ms(rep0, v0, x, n_iters, R), 2)
    # The Pallas side compiles separately so a Mosaic rejection (the round-4
    # failure mode) still yields a report with compile_ok=false instead of a
    # dead bench and no artifact.
    try:
        full1, probe1, rep1, _, v1, _ = build(dtype, batch, length, True)
        # parity first (same init key => identical params)
        y0, i0 = full0(v0, x)
        y1, i1 = full1(v1, x)
        out["indices_bit_equal"] = bool(jnp.array_equal(i0, i1))
        y0f, y1f = y0.astype(jnp.float32), y1.astype(jnp.float32)
        out["wave_rel_err"] = float(
            jnp.linalg.norm(y1f - y0f) / (jnp.linalg.norm(y0f) + 1e-30)
        )
        out["p50_pallas_ms"] = round(p50_ms(rep1, v1, x, n_iters, R), 2)
        out["compile_ok"] = True
        out["speedup"] = round(out["p50_xla_ms"] / out["p50_pallas_ms"], 3)
    except Exception as e:  # Mosaic compile failure or runtime error
        import traceback

        traceback.print_exc()  # full detail to the phase log
        out["compile_ok"] = False
        msg = str(e)
        # keep the informative tail too (the Mosaic message follows a long
        # HTTP/compile-helper preamble that once swallowed the whole budget)
        out["error"] = f"{type(e).__name__}: {msg[:800]}"
        if len(msg) > 800:
            out["error_tail"] = msg[-800:]
        out["p50_pallas_ms"] = None
        out["speedup"] = None
    sec = batch * length / 24000.0
    out["audio_s_per_s_xla"] = round(sec / (out["p50_xla_ms"] / 1e3), 1)
    if out["compile_ok"]:
        out["audio_s_per_s_pallas"] = round(sec / (out["p50_pallas_ms"] / 1e3), 1)
    print(json.dumps(out))
    return out


def main():
    import jax

    if os.environ.get("STACK_F32_ONLY"):
        # re-measure ONLY the f32 row (e.g. after the in-kernel precision
        # fix) and carry the committed bf16 row forward unchanged
        prev = []
        if os.path.exists("STACK_BENCH_r05.json"):
            with open("STACK_BENCH_r05.json") as f:
                prev = [r for r in json.load(f).get("rows", [])
                        if r["config"].startswith("bf16")]
        rows = prev + [run_config("f32", 8, 72000, n_iters=6)]
    else:
        rows = [
            run_config("bf16", 32, 72000, n_iters=10),
            run_config("f32", 8, 72000, n_iters=6),
        ]
    # "win" is what bench.py's headline auto-select gates on: the kernel must
    # COMPILE on real hardware, keep indices bit-exact, and beat XLA on the
    # headline (bf16 b32) config by a margin that survives timing noise.
    bf16 = rows[0]
    report = {
        "device": str(jax.devices()[0]),
        "kernel": "ops/stack_pallas.py fused_residual_stack",
        "rows": rows,
        "win": bool(
            bf16.get("compile_ok")
            and bf16.get("indices_bit_equal")
            and (bf16.get("speedup") or 0.0) > 1.05
        ),
    }
    with open("STACK_BENCH_r05.json", "w") as f:
        json.dump(report, f, indent=1)
    print("wrote STACK_BENCH_r05.json")


if __name__ == "__main__":
    main()
