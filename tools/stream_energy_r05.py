"""STREAM_ENERGY_r05: streaming behavior of the coded-energy flagship.

VERDICT r4 task 7: `energy_rvq` is the quality flagship (+6.2 dB SI-SDR over
plain RVQ, QUALITY_r04.md) but the carried-state streaming runtime
(streaming.py) was only ever validated on the conv+RVQ codec. The energy
descent (models/energy.py) attends over its input window — a global op, so
streaming encode runs it per chunk and is NOT bit-identical to batch encode
(decode-from-indices stays exact; the causal conv/RVQ parts keep their carry
law). This tool measures, on the trained `energy_rvq_speech` checkpoint:

  * code agreement: fraction of streamed indices equal to batch indices, per
    chunk size (the chunk-boundary cost of the per-chunk descent window);
  * quality: held-out metrics (SI-SDR / mel-L1 / MCD) of the batch
    round-trip vs the streamed-codes round-trip, plus SI-SDR between the two
    reconstructions;
  * compute: per-chunk device p50 of the streaming encoder step (which now
    includes the n_iters=8 descent) and decoder step, and the real-time
    margin — the STREAM_r03-style rows.

Writes STREAM_ENERGY_r05.json. Run in the default (TPU) environment.
Reference anchor: the streaming spec is the pad law (networks/vae.py:32-43);
the energy bottleneck is networks/energy_transformer.py.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

SR = 24000
SNAP = "artifacts/ckpt/energy_rvq_speech.npz"
N_ITERS = 8
SMOKE = bool(os.environ.get("STREAM_SMOKE"))  # CPU pipeline check: tiny
# batch/clip, parity rows only, no device timing
B = 1 if SMOKE else 4
CLIP = 24000 if SMOKE else 72000  # 150 latent frames at stride 480:
# chunkable by 25/50/75 (50 frames only in smoke)


def build():
    import jax.numpy as jnp

    import quality_r04 as q
    from audio_generation_tpu.config import VAEConfig
    from audio_generation_tpu.models.vae import model_from_config
    from audio_generation_tpu.train.checkpoint import load_params_npz

    vae_args = dict(q.CONFIGS["energy_rvq_speech"]["vae_args"])
    vae_args["compute_dtype"] = "float32"  # streaming dtype contract
    model = model_from_config(VAEConfig.from_dict(vae_args))
    params, codebook, meta = load_params_npz(SNAP)
    variables = {"params": params, "codebook": codebook}

    from audio_generation_tpu.data.datasets import PseudoSpeech

    ds = PseudoSpeech(length=CLIP, sample_rate=SR, n_items=B, seed=1234)
    waves = np.stack([np.asarray(ds[i][0])[0] for i in range(B)])
    return model, variables, jnp.asarray(waves, jnp.float32), meta


def main():
    import jax
    import jax.numpy as jnp

    from audio_generation_tpu.evaluate import (
        mcd_db,
        mel_distance,
        si_sdr_db,
    )
    from audio_generation_tpu.streaming import StatefulStreamingCodec

    model, variables, waves, meta = build()
    stride = model.scale_factor

    @jax.jit
    def batch_encode(variables, x):
        _zq, _c, idx = model.apply(variables, x[:, :, None], method="encode")
        return idx

    @jax.jit
    def batch_decode(variables, idx):
        y = model.apply(variables, idx, method="decode_indices")
        return y[:, :, 0]

    idx_batch = np.asarray(batch_encode(variables, waves))
    y_batch = np.asarray(batch_decode(variables, jnp.asarray(idx_batch)))
    L = y_batch.shape[-1]
    w = np.asarray(waves)[:, :L]

    def quality(y):
        return {
            "si_sdr_db": round(float(jnp.mean(si_sdr_db(w, y[:, :L]))), 3),
            "mel_l1": round(float(mel_distance(w, y[:, :L], SR)), 4),
            "mcd_db": round(mcd_db(w, y[:, :L], SR), 3),
        }

    rows = []
    for chunk_frames in (25,) if SMOKE else (25, 50, 75):
        sc = StatefulStreamingCodec(
            model=model, variables=variables, chunk_frames=chunk_frames
        )
        t0 = time.time()
        idx_stream = sc.encode_stream(np.asarray(waves))
        agree = float(np.mean(idx_stream == idx_batch))
        # decode-from-indices is exact, so quality deltas below are PURELY
        # the per-chunk descent window (encode-side) effect
        y_stream = np.asarray(batch_decode(variables, jnp.asarray(idx_stream)))
        row = {
            "chunk_frames": chunk_frames,
            "chunk_ms": round(1000.0 * chunk_frames * stride / SR, 1),
            "index_agreement": round(agree, 4),
            "batch_roundtrip": quality(y_batch),
            "stream_roundtrip": quality(y_stream),
            "stream_vs_batch_si_sdr_db": round(
                float(jnp.mean(si_sdr_db(y_batch[:, :L], y_stream[:, :L]))), 3
            ),
            "wall_s_encode_stream": round(time.time() - t0, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    if SMOKE:
        print(json.dumps({"smoke_rows": rows}))
        print("stream_energy smoke OK")
        return

    # ---- per-chunk compute timing (chunk_frames=50 = 1 s of audio) ------ #
    sc = StatefulStreamingCodec(model=model, variables=variables, chunk_frames=50)
    chunk = sc.chunk
    rng = np.random.default_rng(0)
    N_CHAIN, N_T = 8, 8
    chunks = jnp.asarray(rng.normal(size=(N_CHAIN, 1, chunk)).astype(np.float32) * 0.1)
    idxs = jnp.zeros((N_CHAIN, 1, 50, model.num_quantizers), jnp.int32)
    enc_fn, dec_fn = sc._enc_step, sc._dec_step

    @jax.jit
    def enc_chain(state, chunks):
        def body(st, ck):
            st, (idx, _z) = enc_fn(st, ck)
            return st, jnp.sum(idx[:, -1, :])

        _st, probes = jax.lax.scan(body, state, chunks)
        return jnp.sum(probes)

    @jax.jit
    def dec_chain(state, idxs):
        def body(st, ix):
            st, y = dec_fn(st, ix)
            return st, jnp.sum(y[:, -7:])

        _st, probes = jax.lax.scan(body, state, idxs)
        return jnp.sum(probes)

    def p50(f):
        ts = []
        for _ in range(N_T):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        return float(np.percentile(ts, 50))

    float(enc_chain(sc.init_encoder_state(1), chunks))  # compile
    float(dec_chain(sc.init_decoder_state(1), idxs))
    enc_ms = p50(lambda: float(enc_chain(sc.init_encoder_state(1), chunks))) / N_CHAIN * 1e3
    dec_ms = p50(lambda: float(dec_chain(sc.init_decoder_state(1), idxs))) / N_CHAIN * 1e3
    chunk_ms = 1000.0 * chunk / SR

    out = {
        "snapshot": SNAP,
        "snapshot_step": meta.get("step"),
        "bottleneck": "energy_rvq (n_iters=8 descent, then RVQ-8 coding)",
        "semantics": "streaming encode runs the energy descent per chunk "
                     "window (global op -> not bit-identical to batch); "
                     "conv carry + RVQ stay exact; decode-from-indices "
                     "exact. See streaming.py StatefulStreamingCodec.",
        "latency_samples": int(sc.latency_samples),
        "algorithmic_latency_ms": round(1000.0 * sc.latency_samples / SR, 2),
        "rows": rows,
        "timing_b1_chunk50": {
            "chunk_ms": round(chunk_ms, 1),
            "enc_device_p50_ms": round(enc_ms, 2),
            "dec_device_p50_ms": round(dec_ms, 2),
            "rt_margin_device": round(chunk_ms / max(enc_ms + dec_ms, 1e-9), 1),
        },
        "device": str(jax.devices()[0]),
    }
    with open("STREAM_ENERGY_r05.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote STREAM_ENERGY_r05.json")


if __name__ == "__main__":
    main()
