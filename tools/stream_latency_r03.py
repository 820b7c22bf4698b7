"""STREAM_r03: streaming-codec latency artifact (VERDICT.md task 4).

Measures, on the real TPU, the carried-state streaming codec
(audio_generation_tpu/streaming.py StatefulStreamingCodec) on the flagship
RVQ-8 @ 24 kHz model:

  * algorithmic latency (the decoder's exact lookahead, in ms);
  * per-chunk compute time for 20 / 100 / 480 ms chunks — both the amortized
    device time (16 chunks chained through one jit via lax.scan over the
    carried state, so the ~25 ms tunnel dispatch is paid once) and the
    single-dispatch wall time (what a remote client would see per chunk);
  * the real-time margin (chunk duration / compute time).

Writes STREAM_r03.json. Run in the default (TPU) environment.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SR = 24000
N_CHAIN = 16
N_ITERS = 12


def measure(chunk_frames: int):
    import jax
    import jax.numpy as jnp

    from audio_generation_tpu.models import CausalVQAE
    from audio_generation_tpu.streaming import StatefulStreamingCodec

    model = CausalVQAE(num_quantizers=8, codebook_size=1024, input_format="n c l")
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 1, 480 * max(chunk_frames, 10)))
    )
    sc = StatefulStreamingCodec(model=model, variables=variables,
                                chunk_frames=chunk_frames)
    B = 1
    chunk = sc.chunk
    rng = np.random.default_rng(0)
    chunks = jnp.asarray(
        rng.normal(size=(N_CHAIN, B, chunk)).astype(np.float32) * 0.1
    )

    enc_fn = sc._enc_step
    dec_fn = sc._dec_step

    @jax.jit
    def enc_chain(state, chunks):
        def body(st, ck):
            st, (idx, _z) = enc_fn(st, ck)
            return st, idx

        state, idxs = jax.lax.scan(body, state, chunks)
        return jnp.sum(idxs[:, :, -1, :])  # probe forces execution

    @jax.jit
    def dec_chain(state, idxs):
        def body(st, ix):
            st, y = dec_fn(st, ix)
            return st, jnp.sum(y[:, -7:])

        _state, probes = jax.lax.scan(body, state, idxs)
        return jnp.sum(probes)

    # single-dispatch timing helpers (fresh state each call group)
    def p50(f, *args):
        ts = []
        for _ in range(N_ITERS):
            t0 = time.perf_counter()
            f(*args)
            ts.append(time.perf_counter() - t0)
        return float(np.percentile(ts, 50))

    est0 = sc.init_encoder_state(B)
    idxs = jnp.zeros((N_CHAIN, B, chunk_frames, 8), jnp.int32)
    dst0 = sc.init_decoder_state(B)

    # warmup/compile
    float(enc_chain(est0, chunks))
    float(dec_chain(dst0, idxs))
    st = sc.init_encoder_state(B)
    st, out = enc_fn(st, chunks[0]); jax.block_until_ready(out[0])
    dt = sc.init_decoder_state(B)
    dt, y = dec_fn(dt, idxs[0]); np.asarray(y)

    chained_enc = p50(lambda: float(enc_chain(sc.init_encoder_state(B), chunks))) / N_CHAIN
    chained_dec = p50(lambda: float(dec_chain(sc.init_decoder_state(B), idxs))) / N_CHAIN

    # single dispatch: force a host transfer of an output-derived scalar
    def one_enc():
        nonlocal st
        st, (idx, _z) = enc_fn(st, chunks[0])
        float(jnp.sum(idx[:, -1, :]))

    def one_dec():
        nonlocal dt
        dt, y = dec_fn(dt, idxs[0])
        float(jnp.sum(y[:, -7:]))

    single_enc = p50(one_enc)
    single_dec = p50(one_dec)

    chunk_ms = 1000.0 * chunk / SR
    return {
        "chunk_frames": chunk_frames,
        "chunk_ms": round(chunk_ms, 1),
        "enc_device_p50_ms": round(chained_enc * 1000, 3),
        "dec_device_p50_ms": round(chained_dec * 1000, 3),
        "enc_single_dispatch_p50_ms": round(single_enc * 1000, 3),
        "dec_single_dispatch_p50_ms": round(single_dec * 1000, 3),
        "rt_margin_device": round(chunk_ms / max((chained_enc + chained_dec) * 1000, 1e-9), 1),
        "rt_margin_single_dispatch": round(
            chunk_ms / max((single_enc + single_dec) * 1000, 1e-9), 1
        ),
        "algorithmic_latency_ms": round(1000.0 * 944 / SR, 2),  # overwritten below
        "latency_samples": None,
    }


def main():
    import jax
    import jax.numpy as jnp

    from audio_generation_tpu.models import CausalVQAE
    from audio_generation_tpu.streaming import StatefulStreamingCodec

    # latency is architectural: compute once
    model = CausalVQAE(num_quantizers=8, codebook_size=1024, input_format="n c l")
    variables = jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, 1, 4800)))
    sc = StatefulStreamingCodec(model=model, variables=variables, chunk_frames=1)
    lat_samples = sc.latency_samples
    del sc

    rows = []
    for cf in (1, 5, 25):
        r = measure(cf)
        r["latency_samples"] = int(lat_samples)
        r["algorithmic_latency_ms"] = round(1000.0 * lat_samples / SR, 2)
        rows.append(r)
        print(json.dumps(r), flush=True)

    out = {
        "note": (
            "carried-state streaming (StatefulStreamingCodec), flagship RVQ-8 "
            "@ 24 kHz, B=1, TPU v5e; encode is bit-exact vs batch, decode is "
            "batch shifted by latency_samples; device p50 chains 16 chunks "
            "through one jit (state carried in a lax.scan), single-dispatch "
            "includes the remote-tunnel round trip"
        ),
        "device": str(jax.devices()[0]),
        "chunks": rows,
    }
    with open("STREAM_r03.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote STREAM_r03.json")


if __name__ == "__main__":
    main()
