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
