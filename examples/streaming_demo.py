"""Streaming codec demo: chunked encode/decode of an arbitrary-length clip
with carried conv state (bit-exact vs batch; see
audio_generation_tpu/streaming.py).

Run: python examples/streaming_demo.py
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from audio_generation_tpu.data import SyntheticAudio, write_wav
from audio_generation_tpu.models import CausalVQAE
from audio_generation_tpu.streaming import StatefulStreamingCodec


def main():
    sr = 24000
    model = CausalVQAE(
        in_channels=1, num_quantizers=8, codebook_size=1024,
        input_format="n c l", vq_type="ema",
    )
    x0 = jnp.zeros((1, 1, 72000))
    variables = jax.jit(model.init)(jax.random.key(0), x0)

    codec = StatefulStreamingCodec(model=model, variables=variables,
                                   chunk_frames=5)  # 100 ms chunks @ 24 kHz
    wave = SyntheticAudio(length=codec.chunk * 25, sample_rate=sr, n_items=1)[0][0]

    print(f"stride {model.scale_factor}, chunk {codec.chunk} samples "
          f"({1000 * codec.chunk / sr:.0f} ms), decoder algorithmic latency "
          f"{codec.latency_samples} samples ({1000 * codec.latency_samples / sr:.1f} ms)")

    # chunk-by-chunk, as a live stream would arrive
    wave = wave.astype(np.float32)
    chunks = (wave[:, s : s + codec.chunk] for s in range(0, wave.shape[-1], codec.chunk))
    code_chunks = list(codec.encode_iter(chunks))
    codes = np.concatenate(code_chunks, axis=1)
    print(f"encoded {wave.shape[-1]} samples -> codes {codes.shape} "
          f"({codes.shape[1] * 8 * np.log2(1024) / (wave.shape[-1] / sr) / 1000:.1f} kbps)")
    recon = codec.decode_stream(codes)
    print(f"decoded -> {recon.shape}")
    write_wav("streaming_recon.wav", recon[0], sr)
    print("wrote streaming_recon.wav")


if __name__ == "__main__":
    main()
