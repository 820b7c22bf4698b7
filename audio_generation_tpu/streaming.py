"""Streaming (chunked) encode/decode for arbitrary-length audio.

The reference supports arbitrary input length architecturally — fully
convolutional with causal pad math (networks/vae.py:32-43; README.md:48) —
but always processes whole clips. On TPU, XLA wants static shapes, so
streaming is chunked: fixed-size windows [left context | chunk | right
context] are processed by one compiled program per shape and only the chunk's
outputs are emitted (overlap-save).

  * The encoder is strictly causal, so `ctx_left` latent frames of history
    (>= its receptive field) make interior chunks bit-identical to batch
    processing; `ctx_right = 0`.
  * The default decoder upsamplers look ahead (the 'same'-padded conv after
    nearest upsampling, networks/vae.py:66-89, and the wavelet overlap-add),
    so decoding holds back `ctx_right` latent frames — a fixed, known
    algorithmic latency (ctx_right * stride / sample_rate seconds).

Exactness vs. whole-clip processing on interior chunks is property-tested in
tests/test_streaming.py.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Iterable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class StreamingCodec:
    """Chunked codec over a trained CausalVQAE.

    Args:
      model: CausalVQAE module.
      variables: {'params': ..., 'codebook': ...}.
      chunk_frames: latent frames emitted per step (chunk_samples = x stride).
      ctx_left: latent frames of left context (>= receptive field / stride).
      ctx_right: latent frames of decoder lookahead to hold back.
    """

    model: object
    variables: dict
    chunk_frames: int = 50
    ctx_left: int = 32
    ctx_right: int = 8

    def __post_init__(self):
        self.stride = self.model.scale_factor
        self.chunk = self.chunk_frames * self.stride
        self._enc = jax.jit(self._encode_window)
        self._dec = jax.jit(self._decode_window)

    # -------------------------------------------------------------- #
    def _encode_window(self, window):
        """window: (B, (ctx_left + chunk_frames) * stride) -> indices of the
        last chunk_frames latent frames."""
        x = window[:, :, None] if self.model.input_format == "b l c" else window[:, None, :]
        (z_q, _commit, idx), _ = self.model.apply(
            self.variables, x, method="encode", mutable=["codebook"]
        )
        return idx[:, -self.chunk_frames :, :], z_q[:, -self.chunk_frames :, :]

    def _decode_window(self, z_window):
        """z_window: (B, ctx_left + chunk_frames + ctx_right, D) -> waveform
        samples of the middle chunk_frames."""
        y = self.model.apply(self.variables, z_window, method="decode")
        wave = y[:, :, 0] if self.model.input_format == "b l c" else y[:, 0, :]
        start = self.ctx_left * self.stride
        return wave[:, start : start + self.chunk]

    # -------------------------------------------------------------- #
    def encode_stream(self, wave: np.ndarray) -> np.ndarray:
        """wave: (B, L) with L a multiple of chunk samples ->
        indices (B, L/stride, nq), streamed chunk by chunk."""
        B, L = wave.shape
        assert L % self.chunk == 0, f"length must be a multiple of {self.chunk}"
        ctx = np.zeros((B, self.ctx_left * self.stride), dtype=np.float32)
        out = []
        for start in range(0, L, self.chunk):
            chunk = wave[:, start : start + self.chunk]
            window = np.concatenate([ctx, chunk], axis=1)
            idx, _ = self._enc(jnp.asarray(window))
            out.append(np.asarray(idx))
            ctx = window[:, -self.ctx_left * self.stride :]
        return np.concatenate(out, axis=1)

    def decode_stream(self, indices: np.ndarray) -> np.ndarray:
        """indices: (B, T, nq) with T a multiple of chunk_frames ->
        waveform (B, T * stride). Holds back ctx_right frames of lookahead
        (zero-padded at the tail, matching batch decode of a padded clip)."""
        B, T, nq = indices.shape
        assert T % self.chunk_frames == 0
        quantizer = self.model.quantizer
        state = self.variables["codebook"]["state"]
        z_all = np.asarray(quantizer.dequantize(state, jnp.asarray(indices)))
        D = z_all.shape[-1]
        pad_left = np.zeros((B, self.ctx_left, D), dtype=z_all.dtype)
        pad_right = np.zeros((B, self.ctx_right, D), dtype=z_all.dtype)
        z_padded = np.concatenate([pad_left, z_all, pad_right], axis=1)
        out = []
        for fi in range(0, T, self.chunk_frames):
            window = z_padded[:, fi : fi + self.ctx_left + self.chunk_frames + self.ctx_right]
            out.append(np.asarray(self._dec(jnp.asarray(window))))
        return np.concatenate(out, axis=1)

    def roundtrip(self, wave: np.ndarray) -> np.ndarray:
        return self.decode_stream(self.encode_stream(wave))

    @property
    def latency_seconds(self):
        """Algorithmic decoder latency from the lookahead hold-back."""
        return self.ctx_right * self.stride

    def encode_iter(self, chunks: Iterable[np.ndarray]) -> Iterator[np.ndarray]:
        """True streaming API: consume (B, chunk) waveform chunks, yield
        (B, chunk_frames, nq) code chunks."""
        ctx = None
        for chunk in chunks:
            if ctx is None:
                ctx = np.zeros((chunk.shape[0], self.ctx_left * self.stride), dtype=np.float32)
            window = np.concatenate([ctx, chunk], axis=1)
            idx, _ = self._enc(jnp.asarray(window))
            ctx = window[:, -self.ctx_left * self.stride :]
            yield np.asarray(idx)
