"""Benchmark: encode+decode throughput of the flagship codec.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Metric (BASELINE.json): audio seconds processed per wall-clock second per
chip for full encode -> RVQ-8 quantize -> decode at 24 kHz. Baseline target:
>= 20x real-time per TPU v5e chip, so vs_baseline = value / 20.

Headline config is the serving path: bfloat16 conv compute (the RVQ search
stays float32 so codebook indices remain exact), batch 32 x 3 s clips.
The strict-f32 path (bit-stable vs CPU) is reported in `extra`.

Timing note: `jax.block_until_ready` can return early through the axon TPU
tunnel, so every timed call is forced by transferring a tiny
output-dependent reduction to the host, chained across iterations.
"""
from __future__ import annotations

import contextlib
import glob
import json
import os
import time

import numpy as np

# Queue scripts (tools/*_queue*.sh etc.) poll this lock before starting any
# TPU phase, so a driver-run bench never contends with a detached training
# queue for the single chip (the round-4 official bench timed out exactly
# that way). bench.py takes priority: it only WRITES the lock, never waits.
LOCKFILE = "/tmp/tpu_bench.lock"


@contextlib.contextmanager
def bench_lock():
    try:
        with open(LOCKFILE, "w") as f:
            f.write(str(os.getpid()))
    except OSError:
        pass
    try:
        yield
    finally:
        try:
            os.remove(LOCKFILE)
        except OSError:
            pass


def stack_kernel_won() -> bool:
    """True only if the NEWEST committed STACK_BENCH report says the fused
    Pallas stack compiled on real hardware, kept indices bit-exact, and beat
    XLA on the headline config. Probing the kernel inside the headline bench
    burned up to 15 min on a known-broken compile in round 4 — now the probe
    runs only on recorded evidence of a win."""
    reports = sorted(glob.glob("STACK_BENCH_r*.json"))
    if not reports:
        return False
    try:
        with open(reports[-1]) as f:
            return bool(json.load(f).get("win"))
    except Exception:
        return False


def build(dtype, batch, length, pallas_stack=False):
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
    def encode_decode(variables, x):
        (y, _commit, indices), _ = model.apply(variables, x, mutable=["codebook"])
        # tiny output-dependent reduction: transferring it forces execution
        return jnp.sum(y[:, :, ::1024]) + jnp.sum(indices[:, ::64, :]).astype(jnp.float32)

    R = 8

    @jax.jit
    def encode_decode_rep(variables, x):
        # R chained calls inside ONE dispatch (output folds back into the
        # input, so XLA cannot parallelize or elide them): amortizes the
        # ~20 ms host->TPU tunnel dispatch 1/R for a device-throughput
        # number; the single-dispatch latency is reported separately.
        def body(i, carry):
            inp, acc = carry
            p = encode_decode(variables, inp)
            # NaN-proof zero coupling: if the probe ever goes non-finite,
            # 0*p would poison every later chained call
            z = jnp.where(jnp.isfinite(p), p, 0.0) * 0.0
            return (inp + z.astype(inp.dtype), acc + p)

        _, acc = jax.lax.fori_loop(0, R, body, (x, jnp.float32(0.0)))
        return acc

    return encode_decode, encode_decode_rep, R, variables, x


def measure(dtype, batch, length, n_iters, pallas_stack=False):
    """Returns (p50_per_call_amortized, p50_single_dispatch)."""
    fn, fn_rep, R, variables, x = build(dtype, batch, length, pallas_stack)
    float(fn(variables, x))  # compile + warmup
    float(fn_rep(variables, x))
    lat_single, lat_rep = [], []
    for _ in range(n_iters):
        t0 = time.perf_counter()
        _ = float(fn(variables, x))
        lat_single.append(time.perf_counter() - t0)
    for _ in range(n_iters):
        t0 = time.perf_counter()
        _ = float(fn_rep(variables, x))
        lat_rep.append(time.perf_counter() - t0)
    return (
        float(np.percentile(lat_rep, 50)) / R,
        float(np.percentile(lat_single, 50)),
    )


def main():
    import jax
    import jax.numpy as jnp

    sample_rate = 24000
    seconds_per_clip = 3
    length = sample_rate * seconds_per_clip

    batch = 32
    p50_bf16, p50_bf16_1 = measure(jnp.bfloat16, batch, length, n_iters=10)
    # Fused residual-stack Pallas kernel (ops/stack_pallas.py) as an
    # alternative headline execution strategy: same math/params, indices
    # bit-equal. Only probed when the newest STACK_BENCH_r*.json records a
    # hardware-validated win (see stack_kernel_won), and even then bounded to
    # 120 s — the XLA path above is always the fallback headline.
    p50_pl = p50_pl_1 = None
    if jax.default_backend() == "tpu" and stack_kernel_won():
        import signal

        def _timeout(signum, frame):
            raise TimeoutError("pallas-stack bench timed out")

        old = signal.signal(signal.SIGALRM, _timeout)
        signal.alarm(120)
        try:
            p50_pl, p50_pl_1 = measure(
                jnp.bfloat16, batch, length, n_iters=10, pallas_stack=True
            )
        except Exception:
            p50_pl = p50_pl_1 = None
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, old)
    stack_won = p50_pl is not None and p50_pl < p50_bf16
    if stack_won:
        p50_bf16, p50_bf16_1 = p50_pl, p50_pl_1
    p50_f32_b8, p50_f32_b8_1 = measure(jnp.float32, 8, length, n_iters=6)

    value = batch * seconds_per_clip / p50_bf16
    f32_rtf = 8 * seconds_per_clip / p50_f32_b8

    print(
        json.dumps(
            {
                "metric": "encode+decode audio sec/s/chip (RVQ-8 @24kHz)",
                "value": round(value, 2),
                "unit": "audio_sec/s",
                "vs_baseline": round(value / 20.0, 3),
                "extra": {
                    "rtf_bf16_b32": round(value, 2),
                    "p50_device_ms_bf16_b32": round(p50_bf16 * 1e3, 2),
                    "p50_single_dispatch_ms_bf16_b32": round(p50_bf16_1 * 1e3, 2),
                    "rtf_f32_b8": round(f32_rtf, 2),
                    "p50_device_ms_f32_b8": round(p50_f32_b8 * 1e3, 2),
                    "p50_single_dispatch_ms_f32_b8": round(p50_f32_b8_1 * 1e3, 2),
                    "note": "bf16 convs, f32 RVQ search (exact indices); "
                    "device p50 amortizes the remote-tunnel dispatch over 8 "
                    "in-jit chained calls, single-dispatch includes it",
                    "headline_exec": (
                        "pallas fused residual stacks" if stack_won else "xla"
                    ),
                    "p50_device_ms_pallas_stack": (
                        None if p50_pl is None else round(p50_pl * 1e3, 2)
                    ),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    with bench_lock():
        main()
