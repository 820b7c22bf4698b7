"""Streaming (chunked) encode/decode for arbitrary-length audio.

The reference supports arbitrary input length architecturally — fully
convolutional with causal pad math (networks/vae.py:32-43; README.md:48) —
but always processes whole clips. On TPU, XLA wants static shapes, so
streaming is chunked. Two implementations:

  * `StatefulStreamingCodec` (the default): per-layer carried conv state.
    The causal pad law IS the carry spec — a CausalConv1d's left pad of
    dilation*(k-1)-stride+1 zeros (networks/vae.py:32-43) becomes a ring of
    that many real history samples, so chunked encoding is bit-identical to
    batch processing from the very first sample with ZERO recomputation.
    Decoder ops with bounded lookahead (the 'same' conv after nearest
    upsampling, networks/vae.py:66-89; the wavelet overlap-add + its convs,
    networks/wavelets.py:191-231) become explicit, tracked delays: the
    emitted stream equals the batch decode shifted by `latency_samples` —
    the codec's exact algorithmic latency.

  * `StreamingCodec`: the overlap-save fallback — fixed windows
    [left context | chunk | right context] recomputed per step (kept as the
    reference implementation the carried-state path is tested against; it
    re-encodes ctx_left/chunk extra work per chunk).

Exactness vs. whole-clip processing is property-tested in
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
    def latency_samples(self):
        """Algorithmic decoder latency (in samples) from the lookahead
        hold-back — an upper bound; the carried-state codec tracks the exact
        value."""
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


# =========================================================================== #
# Carried-state streaming
# =========================================================================== #

def _resolve_weight(p):
    """Effective f32 conv weight from a flax param dict: weight-norm (v, g)
    -> v * g / ||v|| (per output channel, torch weight_norm dim=0 semantics),
    else the raw w. Returns (w (K, Cin, Cout), b or None)."""
    if "v" in p:
        v = jnp.asarray(p["v"], jnp.float32)
        g = jnp.asarray(p["g"], jnp.float32)
        norm = jnp.linalg.norm(v.reshape(-1, v.shape[-1]), axis=0)
        w = v * (g / jnp.maximum(norm, 1e-12))
    else:
        w = jnp.asarray(p["w"], jnp.float32)
    b = jnp.asarray(p["b"], jnp.float32) if "b" in p else None
    return w, b


def _leaky(x):
    return jax.nn.leaky_relu(x, 0.1)


class _Op:
    """One streaming op: `init_state(B)` -> carry pytree;
    `step(state, x) -> (state, y)`. `delay_frames` is the op's emission delay
    in its OUTPUT-rate samples; `upsample` its rate multiplier."""

    delay = 0
    upsample = 1

    def init_state(self, batch):
        return ()

    def step(self, state, x):
        raise NotImplementedError


class _CausalConvOp(_Op):
    """Strict-causal conv (reference pad law, networks/vae.py:32-43): the
    left pad of P = dilation*(k-1) - stride + 1 zeros becomes P carried
    history samples; VALID conv over [carry | chunk] then emits exactly
    chunk_len/stride outputs. No delay, exact from sample 0."""

    def __init__(self, p, stride=1, dilation=1, act=False):
        self.w, self.b = _resolve_weight(p)
        self.k = self.w.shape[0]
        self.cin = self.w.shape[1]
        self.stride, self.dilation, self.act = stride, dilation, act
        self.carry_len = max(dilation * (self.k - 1) - stride + 1, 0)
        self.upsample = 1  # (downsampling ops set emitted-length via stride)

    def init_state(self, batch):
        if self.carry_len == 0:
            return ()
        return jnp.zeros((batch, self.carry_len, self.cin), jnp.float32)

    def step(self, state, x):
        if self.carry_len > 0:
            x = jnp.concatenate([state, x], axis=1)
            state = x[:, -self.carry_len :]
        y = jax.lax.conv_general_dilated(
            x, self.w, window_strides=(self.stride,), padding="VALID",
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            precision=jax.lax.Precision.HIGHEST,
        )
        if self.b is not None:
            y = y + self.b
        if self.act:
            y = _leaky(y)
        return state, y


class _CausalConvTOp(_Op):
    """Causal transposed conv (networks/vae.py:58-64): the (k - stride)
    right-cropped tail contributions are the carry, overlap-added into the
    next chunk's head. No delay."""

    def __init__(self, p, stride=1, act=False):
        self.w, self.b = _resolve_weight(p)
        self.k = self.w.shape[0]
        self.cout = self.w.shape[2]
        self.stride, self.act = stride, act
        self.carry_len = self.k - stride
        self.upsample = stride

    def init_state(self, batch):
        if self.carry_len <= 0:
            return ()
        return jnp.zeros((batch, self.carry_len, self.cout), jnp.float32)

    def step(self, state, x):
        L = x.shape[1]
        y = jax.lax.conv_transpose(
            x, self.w.swapaxes(1, 2), strides=(self.stride,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"), transpose_kernel=True,
            precision=jax.lax.Precision.HIGHEST,
        )  # (B, (L-1)*s + k, Cout)
        if self.carry_len > 0:
            # overlap-add the previous chunk's tail into the full pre-crop
            # output (its length L*s + k - s always covers carry_len)
            y = y + jnp.pad(
                state, ((0, 0), (0, y.shape[1] - self.carry_len), (0, 0))
            )
            state = y[:, L * self.stride :]
        emit = y[:, : L * self.stride]
        if self.b is not None:
            emit = emit + self.b
        if self.act:
            emit = _leaky(emit)
        return state, emit


class _UpsampleConvOp(_Op):
    """Nearest-upsample + 'same' conv (networks/vae.py:66-89) via the exact
    phase decomposition (ops/conv.py): a stride-1 frame-rate conv with kernel
    kp and window [m_min, m_min + kp) around each frame. The (kp-1+m_min)
    future frames become a 1-frame-typ. delay; history is kp-1 frames."""

    def __init__(self, p, stride, act=False):
        from audio_generation_tpu.ops.conv import upsample_phase_kernel

        w, self.b = _resolve_weight(p)
        self.stride = stride
        self.cin = w.shape[1]
        self.cout = w.shape[2]
        wp, m_min, kp = upsample_phase_kernel(w, stride)
        self.wp = wp  # (kp, Cin, stride*Cout) f32
        self.kp = kp
        self.lookahead = kp - 1 + m_min  # frames of future context
        self.carry_len = kp - 1
        self.delay = self.lookahead * stride  # in output-rate samples
        self.act = act
        self.upsample = stride

    def init_state(self, batch):
        if self.carry_len == 0:  # kp == 1 (kernel <= stride): stateless
            return ()
        return jnp.zeros((batch, self.carry_len, self.cin), jnp.float32)

    def step(self, state, x):
        if self.carry_len > 0:  # guard: x[:, -0:] would keep the WHOLE chunk
            x = jnp.concatenate([state, x], axis=1)
            state = x[:, -self.carry_len :]
        y = jax.lax.conv_general_dilated(
            x, self.wp, window_strides=(1,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            precision=jax.lax.Precision.HIGHEST,
        )  # (B, L, s*Cout)
        Bz, L = y.shape[0], y.shape[1]
        y = y.reshape(Bz, L * self.stride, self.cout)
        if self.b is not None:
            y = y + self.b
        if self.act:
            y = _leaky(y)
        return state, y


class _SameConvOp(_Op):
    """'same'-padded stride-1 conv (the wavelet in/out convs,
    networks/wavelets.py:191-199): (k-1)//2-sample lookahead becomes delay;
    history is k-1 samples."""

    def __init__(self, p, act=False):
        self.w, self.b = _resolve_weight(p)
        self.k = self.w.shape[0]
        self.cin = self.w.shape[1]
        self.carry_len = self.k - 1
        self.delay = self.k - 1 - (self.k - 1) // 2  # right lookahead
        self.act = act

    def init_state(self, batch):
        if self.carry_len == 0:
            return ()
        return jnp.zeros((batch, self.carry_len, self.cin), jnp.float32)

    def step(self, state, x):
        if self.carry_len > 0:
            x = jnp.concatenate([state, x], axis=1)
            state = x[:, -self.carry_len :]
        y = jax.lax.conv_general_dilated(
            x, self.w, window_strides=(1,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            precision=jax.lax.Precision.HIGHEST,
        )
        if self.b is not None:
            y = y + self.b
        if self.act:
            y = _leaky(y)
        return state, y


class _WaveletTwoTapOp(_Op):
    """The wavelet overlap-add's two-tap law (models/wavelets.py:
    wavelet_two_tap_weights): y[s*m + r] = x[m]*A[r] + x[m+1]*B[r]. The one
    future frame becomes a 1-frame carry -> s output samples of delay."""

    def __init__(self, scale_param, n_points, interval, hidden, stride):
        from audio_generation_tpu.models.wavelets import (
            wavelet_kernel,
            wavelet_two_tap_weights,
        )

        space = jnp.linspace(interval[0], interval[1], n_points)
        scale = jnp.asarray(scale_param, jnp.float32)
        kern = jnp.broadcast_to(wavelet_kernel(scale, space), (hidden, n_points))
        A, Bw = wavelet_two_tap_weights(kern.astype(jnp.float32), stride)
        self.A = A.T[None, None]  # (1, 1, s, H)
        self.Bw = Bw.T[None, None]
        self.H = hidden
        self.stride = stride
        self.delay = stride  # one input frame, at output rate
        self.upsample = stride

    def init_state(self, batch):
        return jnp.zeros((batch, 1, self.H), jnp.float32)

    def step(self, state, x):
        xs = jnp.concatenate([state, x], axis=1)  # (B, L+1, H)
        state = x[:, -1:]
        cur, nxt = xs[:, :-1], xs[:, 1:]
        Bz, L = cur.shape[0], cur.shape[1]
        y = cur[:, :, None, :] * self.A + nxt[:, :, None, :] * self.Bw
        return state, y.reshape(Bz, L * self.stride, self.H)


class _ResBlockOp(_Op):
    """Streaming CausalResidualBlock1d (networks/vae.py:91-117): two strict-
    causal convs inside a residual add — zero delay, so the skip needs no
    alignment buffer."""

    def __init__(self, p, dilation):
        self.conv1 = _CausalConvOp(p["conv1"], dilation=dilation)
        self.conv2 = _CausalConvOp(p["conv2"])

    def init_state(self, batch):
        return (self.conv1.init_state(batch), self.conv2.init_state(batch))

    def step(self, state, x):
        s1, s2 = state
        s1, h = self.conv1.step(s1, x)
        h = _leaky(h)
        s2, h = self.conv2.step(s2, h)
        return (s1, s2), x + h


class _ActOp(_Op):
    def step(self, state, x):
        return state, _leaky(x)


def _assign_cum_delays(ops) -> int:
    """Walk the chain forward assigning each op its CUMULATIVE emission delay
    (in its own output-rate samples); returns the chain total = the codec's
    algorithmic latency in final-output samples."""
    cum = 0
    for op in ops:
        cum = cum * op.upsample + op.delay
        op.cum_delay = cum
    return cum


def _chain_step(ops, states, counters, x):
    """Run one chunk through the op chain. Each op's first `cum_delay`
    emitted samples correspond to pre-stream time (t < 0 of the batch
    timeline); masking them to zero reproduces the batch pad-law semantics
    exactly, so the streamed output IS the batch output delayed by the chain
    latency — no start-of-stream transient."""
    new_states, new_counters = [], []
    for op, s, n in zip(ops, states, counters):
        s, x = op.step(s, x)
        cum = getattr(op, "cum_delay", 0)
        if cum > 0:
            pos = n + jnp.arange(x.shape[1])
            x = jnp.where(pos[None, :, None] < cum, 0.0, x)
            n = n + x.shape[1]
        new_states.append(s)
        new_counters.append(n)
    return tuple(new_states), tuple(new_counters), x


@dataclass
class StatefulStreamingCodec:
    """Carried-state streaming over a trained CausalVQAE: one jitted step per
    direction, state threaded explicitly (donated), zero recompute.

    Encoding is BIT-IDENTICAL to batch encoding from the first sample (the
    encoder is strictly causal). Decoding is the batch decode delayed by
    `latency_samples` (the decoder's exact algorithmic lookahead — the
    upsample convs see up to 1 future frame each, networks/vae.py:77-83, and
    the wavelet path 1 frame + (k-1)//2 samples, networks/wavelets.py:191-231).

    Dtype contract: this codec computes in f32/Precision.HIGHEST by
    construction, so the bit-identity above holds against the f32 batch path
    (model.compute_dtype = float32). A bfloat16-configured model's batch
    encode rounds differently (fusion-dependent) and may flip indices near
    codebook decision boundaries — for file coding, tools/codec_cli coerces
    BOTH paths to f32 (see tools/codec_cli._f32).
    """

    model: object
    variables: dict
    chunk_frames: int = 50

    def __post_init__(self):
        m = self.model
        assert m.bottleneck in ("rvq", "energy_rvq"), (
            "streaming supports the RVQ and coded-energy bottlenecks"
        )
        # energy_rvq chunk semantics: the energy-transformer descent
        # (models/energy.py) attends over its INPUT WINDOW — a global, not
        # frame-causal, op. Batch encode descends over the whole latent
        # sequence; streaming descends over each chunk's latent frames
        # independently. Encode is therefore NOT bit-identical to batch for
        # energy_rvq (indices may differ near chunk boundaries — measured in
        # STREAM_ENERGY_r05.json); decode-from-indices remains exact, and the
        # plain-RVQ path keeps its bit-identity guarantee below.
        assert not m.depthwise, "streaming plan covers the default conv stack"
        params = jax.device_get(self.variables["params"])
        self.stride = m.scale_factor
        self.chunk = self.chunk_frames * self.stride
        chans = [m.first_block_channels * m.channel_multiplier**i
                 for i in range(m.n_blocks + 1)]
        wavelet_flags = list(m.wavelet_decoders)[::-1] if isinstance(
            m.wavelet_decoders, (list, tuple)
        ) else [bool(m.wavelet_decoders)] * m.n_blocks

        # -------- encoder plan (mirrors CausalVQAE.encoder_fn) ----------- #
        enc = [_CausalConvOp(params["enc_stem"])]
        for i in range(m.n_blocks):
            bp = params[f"enc_blocks_{i}"]
            for j in range(m.n_layers_per_block - 1):
                enc.append(_ResBlockOp(bp[f"res{j}"], dilation=3**j))
                enc.append(_ActOp())
            enc.append(
                _CausalConvOp(bp["down"], stride=m.strides[i], act=True)
            )
        enc.append(_CausalConvOp(params["enc_out"]))
        self._enc_ops = enc

        # -------- decoder plan (mirrors CausalVQAE.decoder_fn) ----------- #
        dec = [_CausalConvTOp(params["dec_stem"], stride=1)]
        for bi, i in enumerate(range(m.n_blocks, 0, -1)):
            bp = params[f"dec_blocks_{bi}"]
            stride = m.strides[i - 1]
            cout = chans[i - 1]
            if wavelet_flags[i - 1]:
                wp = bp["up_wavelet"]
                hidden = cout * 4  # wavelet_hidden_ratio (blocks.py)
                n_points = 2 * stride * 4
                dec.append(_SameConvOp(wp["conv_in"]))
                dec.append(
                    _WaveletTwoTapOp(
                        wp["wavelet_scale"], n_points, (-10.0, 10.0), hidden, stride
                    )
                )
                dec.append(_SameConvOp(wp["conv_out"], act=True))
            else:
                dec.append(_UpsampleConvOp(bp["up"], stride=stride, act=True))
            for j in range(m.n_layers_per_block - 1):
                dec.append(_ResBlockOp(bp[f"res{j}"], dilation=3**j))
                dec.append(_ActOp())
        dec.append(_CausalConvOp(params["dec_out"]))
        self._dec_ops = dec
        _assign_cum_delays(enc)  # encoder is strictly causal: all zero
        self.latency_samples = _assign_cum_delays(dec)

        # -------- quantizer (frame-local, eval semantics) ---------------- #
        q = m.quantizer
        # coerce to jax arrays: npz-restored codebooks arrive as numpy, and
        # numpy fancy-indexing with a traced index array raises
        # TracerArrayConversionError inside the jitted steps
        qstate = jax.tree_util.tree_map(
            jnp.asarray, self.variables["codebook"]["state"]
        )

        energy_fn = None
        if m.bottleneck == "energy_rvq":

            def energy_fn(z):  # per-chunk descent window (see __post_init__)
                z_e, _aux = self.model.apply(
                    self.variables,
                    z.astype(jnp.float32),
                    method=lambda mm, zz: mm.energy_bottleneck(zz),
                )
                return z_e.astype(z.dtype)

        def enc_step(state, chunk):
            ops_states, counters = state
            ops_states, counters, z = _chain_step(
                self._enc_ops, ops_states, counters, chunk[:, :, None]
            )
            if energy_fn is not None:
                z = energy_fn(z)
            z_q, idx, _commit, _ = q(
                qstate, z, codebook_n=None, update_codebook=False
            )
            return (ops_states, counters), (idx, z_q)

        def dec_step(state, idx):
            ops_states, counters = state
            z = q.dequantize(qstate, idx)
            ops_states, counters, y = _chain_step(
                self._dec_ops, ops_states, counters, z
            )
            return (ops_states, counters), y[:, :, 0]

        self._enc_step = jax.jit(enc_step, donate_argnums=(0,))
        self._dec_step = jax.jit(dec_step, donate_argnums=(0,))

    # ------------------------------------------------------------------ #
    def init_encoder_state(self, batch: int):
        return (
            tuple(op.init_state(batch) for op in self._enc_ops),
            tuple(jnp.int32(0) for _ in self._enc_ops),
        )

    def init_decoder_state(self, batch: int):
        return (
            tuple(op.init_state(batch) for op in self._dec_ops),
            tuple(jnp.int32(0) for _ in self._dec_ops),
        )

    def latency_seconds(self, sample_rate: int) -> float:
        """Exact algorithmic decoder latency (excludes chunk buffering)."""
        return self.latency_samples / sample_rate

    # ------------------------------------------------------------------ #
    def encode_iter(self, chunks: Iterable[np.ndarray]) -> Iterator[np.ndarray]:
        """Consume (B, chunk) waveform chunks, yield (B, chunk_frames, nq)
        code chunks. Bit-identical to batch encoding."""
        state = None
        for chunk in chunks:
            if state is None:
                state = self.init_encoder_state(chunk.shape[0])
            state, (idx, _z) = self._enc_step(state, jnp.asarray(chunk, jnp.float32))
            yield np.asarray(idx)

    def decode_iter(self, code_chunks: Iterable[np.ndarray]) -> Iterator[np.ndarray]:
        """Consume (B, T, nq) code chunks, yield (B, T*stride) waveform
        chunks (each delayed by `latency_samples` relative to batch decode)."""
        state = None
        for idx in code_chunks:
            if state is None:
                state = self.init_decoder_state(idx.shape[0])
            state, y = self._dec_step(state, jnp.asarray(idx))
            yield np.asarray(y)

    def encode_stream(self, wave: np.ndarray) -> np.ndarray:
        B, L = wave.shape
        assert L % self.chunk == 0, f"length must be a multiple of {self.chunk}"
        chunks = (wave[:, s : s + self.chunk] for s in range(0, L, self.chunk))
        return np.concatenate(list(self.encode_iter(chunks)), axis=1)

    def decode_stream(self, indices: np.ndarray) -> np.ndarray:
        B, T, _ = indices.shape
        assert T % self.chunk_frames == 0
        chunks = (
            indices[:, f : f + self.chunk_frames]
            for f in range(0, T, self.chunk_frames)
        )
        return np.concatenate(list(self.decode_iter(chunks)), axis=1)

    def roundtrip(self, wave: np.ndarray) -> np.ndarray:
        return self.decode_stream(self.encode_stream(wave))
