"""Streaming codec demo: chunked encode/decode of an arbitrary-length clip.

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
from audio_generation_tpu.streaming import StreamingCodec


def main():
    sr = 24000
    model = CausalVQAE(
        in_channels=1, num_quantizers=8, codebook_size=1024,
        input_format="n c l", vq_type="ema",
    )
    x0 = jnp.zeros((1, 1, 72000))
    variables = model.init(jax.random.key(0), x0)

    codec = StreamingCodec(model, variables, chunk_frames=50)  # 1 s chunks @24k
    wave = SyntheticAudio(length=codec.chunk * 5, sample_rate=sr, n_items=1)[0][0]

    print(f"stride {model.scale_factor}, chunk {codec.chunk} samples, "
          f"decoder latency {codec.latency_seconds} samples")
    codes = codec.encode_stream(wave.astype(np.float32))
    print(f"encoded {wave.shape[-1]} samples -> codes {codes.shape} "
          f"({codes.shape[1] * 8 * np.log2(1024) / (wave.shape[-1] / sr) / 1000:.1f} kbps)")
    recon = codec.decode_stream(codes)
    print(f"decoded -> {recon.shape}")
    write_wav("streaming_recon.wav", recon[0], sr)
    print("wrote streaming_recon.wav")


if __name__ == "__main__":
    main()
