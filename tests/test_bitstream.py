"""Packed .agc bitstream: bit-exact round trips, truncation, CLI helpers."""
import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_generation_tpu.bitstream import (
    BitstreamMeta,
    bits_for,
    read_bitstream,
    write_bitstream,
)

SIZES = (1024, 500, 32, 3)  # mixed power-of-2 / odd codebook sizes


def test_bits_for():
    assert bits_for(1024) == 10
    assert bits_for(500) == 9
    assert bits_for(512) == 9
    assert bits_for(3) == 2
    assert bits_for(2) == 1
    assert bits_for(1) == 1


def _random_indices(rng, T, sizes):
    return np.stack(
        [rng.integers(0, s, size=T).astype(np.int32) for s in sizes], axis=1
    )


def test_roundtrip_exact(rng):
    T = 337  # deliberately not byte-aligned for any level
    idx = _random_indices(rng, T, SIZES)
    buf = io.BytesIO()
    n = write_bitstream(buf, idx, SIZES, 24000, 480, original_length=161000)
    got, meta = read_bitstream(buf.getvalue())
    np.testing.assert_array_equal(got, idx)
    assert meta.sample_rate == 24000
    assert meta.stride == 480
    assert meta.num_frames == T
    assert meta.original_length == 161000
    assert meta.codebook_sizes == SIZES
    # file size = header + per-level ceil(T*bits/8)
    expect = 32 + 4 * len(SIZES) + sum((T * bits_for(s) + 7) // 8 for s in SIZES)
    assert n == len(buf.getvalue()) == expect


def test_bitrate_math():
    meta = BitstreamMeta(24000, 480, 150, 72000, (1024,) * 8)
    assert meta.bits_per_frame == 80
    assert meta.bitrate_bps == pytest.approx(4000.0)  # the flagship's 4 kbps
    assert meta.duration_seconds == pytest.approx(3.0)


def test_level_truncation_prefix(rng):
    idx = _random_indices(rng, 64, SIZES)
    buf = io.BytesIO()
    write_bitstream(buf, idx, SIZES, 16000, 480, 30000)
    got, meta = read_bitstream(buf.getvalue(), max_levels=2)
    np.testing.assert_array_equal(got, idx[:, :2])
    assert meta.codebook_sizes == SIZES[:2]
    assert meta.bits_per_frame == bits_for(1024) + bits_for(500)


def test_errors(rng):
    idx = _random_indices(rng, 8, (16,))
    with pytest.raises(ValueError, match="does not fit"):
        write_bitstream(io.BytesIO(), idx + 16, (16,), 16000, 480, 100)
    with pytest.raises(ValueError, match="magic"):
        read_bitstream(b"NOPE" + b"\x00" * 60)
    buf = io.BytesIO()
    write_bitstream(buf, idx, (16,), 16000, 480, 100)
    with pytest.raises(ValueError, match="truncated"):
        read_bitstream(buf.getvalue()[:-2])
    with pytest.raises(ValueError, match="too short"):
        read_bitstream(b"AGC1")


# --------------------------------------------------------------------------- #
# End-to-end with a small codec (batch vs stream parity of the CLI helpers)
# --------------------------------------------------------------------------- #
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
    from audio_generation_tpu.models import CausalVQAE

    model = CausalVQAE(**SMALL)
    x = jnp.zeros((1, 1, 24 * 50))
    variables = model.init(jax.random.key(0), x)
    return model, variables


def test_encode_decode_array_roundtrip(codec, rng):
    from tools.codec_cli import decode_array, encode_array

    model, variables = codec
    L = 24 * 40 + 7  # not chunk- or stride-aligned
    wave = (rng.normal(size=L) * 0.3).astype(np.float32)

    idx, meta = encode_array(model, variables, wave, 24000, chunk_frames=10)
    assert meta["original_length"] == L
    assert meta["stride"] == 24
    # pad law: frames cover L + latency, whole chunks
    assert idx.shape[0] * 24 >= L
    assert idx.shape[0] % 10 == 0

    buf = io.BytesIO()
    write_bitstream(buf, idx, **meta)
    got, m = read_bitstream(buf.getvalue())
    np.testing.assert_array_equal(got, idx)

    y = decode_array(model, variables, got, m.original_length, chunk_frames=10)
    assert y.shape == (L,)
    assert np.isfinite(y).all()


def test_stream_equals_batch(codec, rng):
    from tools.codec_cli import decode_array, encode_array

    model, variables = codec
    L = 24 * 60
    wave = (rng.normal(size=L) * 0.3).astype(np.float32)

    idx_b, meta = encode_array(model, variables, wave, 24000, chunk_frames=10)
    idx_s, _ = encode_array(
        model, variables, wave, 24000, chunk_frames=10, stream=True
    )
    # carried-state streaming encode is bit-exact vs batch
    np.testing.assert_array_equal(idx_s, idx_b)

    y_b = decode_array(model, variables, idx_b, L, chunk_frames=10)
    y_s = decode_array(model, variables, idx_b, L, chunk_frames=10, stream=True)
    # streamed decode = batch decode delayed by latency; after the trim both
    # carry the same samples
    np.testing.assert_allclose(y_s, y_b, atol=1e-4)


def test_bf16_model_streams_match_batch(codec, rng):
    """A bfloat16-trained checkpoint must still produce byte-identical
    batch/stream bitstreams: the CLI coerces file coding to the f32 path
    (tools/codec_cli._f32 — bf16 rounding is fusion-dependent, and the
    carried-state streaming codec is f32 by construction)."""
    from tools.codec_cli import encode_array

    model, variables = codec
    bf16 = model.clone(compute_dtype=jnp.bfloat16)
    L = 24 * 60
    wave = (rng.normal(size=L) * 0.3).astype(np.float32)

    idx_b, _ = encode_array(bf16, variables, wave, 24000, chunk_frames=10)
    idx_s, _ = encode_array(
        bf16, variables, wave, 24000, chunk_frames=10, stream=True
    )
    np.testing.assert_array_equal(idx_s, idx_b)

    # and the coerced path is the f32 path: same indices as the f32 model
    idx_f, _ = encode_array(model, variables, wave, 24000, chunk_frames=10)
    np.testing.assert_array_equal(idx_b, idx_f)


def test_truncated_level_decode(codec, rng):
    """Decoding a 2-of-4-level stream = dequantize over the first 2 levels
    (the RVQ residual-cascade truncation law)."""
    from tools.codec_cli import decode_array, encode_array

    model, variables = codec
    L = 24 * 30
    wave = (rng.normal(size=L) * 0.3).astype(np.float32)
    idx, meta = encode_array(
        model, variables, wave, 24000, levels=2, chunk_frames=10
    )
    assert idx.shape[1] == 2
    assert meta["codebook_sizes"] == [32, 32]

    y = decode_array(model, variables, idx, L, chunk_frames=10)
    assert y.shape == (L,)

    # equals manual first-2-level dequantize + decode
    state = variables["codebook"]["state"]
    z = model.quantizer.dequantize(state, jnp.asarray(idx[None]))
    y_ref = model.apply(variables, z, method="decode")[0, 0, : L]
    np.testing.assert_allclose(y, np.asarray(y_ref), atol=1e-5)


def test_energy_rvq_file_coding(rng):
    """The coded energy-transformer bottleneck (bottleneck='energy_rvq')
    file-codes on the BATCH path: the energy descent attends across the
    whole latent sequence, so there is no carried-state stream form —
    encode_array must not construct the streaming codec for it, and
    --stream must be a clear error, not an assert."""
    import pytest

    from audio_generation_tpu.models import CausalVQAE
    from tools.codec_cli import decode_array, encode_array

    model = CausalVQAE(
        **{**SMALL, "codebook_dim": 16},
        bottleneck="energy_rvq",
        energy_kwargs={"n_iters": 2, "n_heads": 2, "head_dim": 8},
    )
    x = jnp.zeros((1, 1, 24 * 50))
    variables = model.init(jax.random.key(0), x)

    L = 24 * 40 + 7
    wave = (rng.normal(size=L) * 0.3).astype(np.float32)
    idx, meta = encode_array(model, variables, wave, 24000, chunk_frames=10)
    assert meta["stride"] == 24 and meta["original_length"] == L
    assert idx.shape[0] % 10 == 0 and idx.shape[1] == 4

    buf = io.BytesIO()
    write_bitstream(buf, idx, **meta)
    got, m = read_bitstream(buf.getvalue())
    np.testing.assert_array_equal(got, idx)
    y = decode_array(model, variables, got, m.original_length, chunk_frames=10)
    assert y.shape == (L,) and np.isfinite(y).all()

    with pytest.raises(SystemExit, match="RVQ bottleneck"):
        encode_array(model, variables, wave, 24000, chunk_frames=10,
                     stream=True)
    with pytest.raises(SystemExit, match="RVQ bottleneck"):
        decode_array(model, variables, got, L, chunk_frames=10, stream=True)


def test_corrupt_header_bounds(rng):
    """ADVICE r3: header fields must be bounded before any allocation."""
    import struct

    idx = _random_indices(rng, 8, (16,))
    buf = io.BytesIO()
    write_bitstream(buf, idx, (16,), 16000, 480, 100)
    blob = bytearray(buf.getvalue())

    # num_frames inflated to a huge u64 -> rejected against payload length,
    # not allocated (the header layout is MAGIC u32, ver u8, nq u8, flags
    # u16, sr u32, stride u32, T u64, orig u64 per bitstream._HEADER)
    from audio_generation_tpu.bitstream import _HEADER

    magic, ver, nq, flags, sr, stride, T, orig = _HEADER.unpack_from(blob, 0)
    huge = bytearray(blob)
    huge[: _HEADER.size] = _HEADER.pack(magic, ver, nq, flags, sr, stride, 2**40, orig)
    with pytest.raises(ValueError, match="truncated"):
        read_bitstream(bytes(huge))

    # stride == 0 -> rejected at parse time (bitrate_bps would divide by 0)
    zs = bytearray(blob)
    zs[: _HEADER.size] = _HEADER.pack(magic, ver, nq, flags, sr, 0, T, orig)
    with pytest.raises(ValueError, match="stride"):
        read_bitstream(bytes(zs))


def test_codec_cli_snapshot_loading(codec, rng, tmp_path):
    """codec_cli --snapshot: a committed npz (save_params_npz + embedded
    vae_args/sample_rate meta) reconstructs the SAME codec with no YAML or
    Orbax run dir — indices bit-match the direct-model path. This is the
    VM-reset-durable product path (artifacts/ckpt/*.npz)."""
    import argparse

    from audio_generation_tpu.train.checkpoint import save_params_npz
    from tools.codec_cli import _load_model, encode_array

    model, variables = codec
    snap = str(tmp_path / "small.npz")
    save_params_npz(
        snap,
        jax.device_get(variables["params"]),
        jax.device_get(variables["codebook"]),
        {"config": "small", "step": 5, "vae_args": SMALL, "sample_rate": 24000},
    )
    m2, v2, sr = _load_model(argparse.Namespace(snapshot=snap, yaml=None))
    assert sr == 24000

    wave = (rng.normal(size=24 * 40) * 0.3).astype(np.float32)
    idx1, _ = encode_array(model, variables, wave, sr, chunk_frames=10)
    idx2, _ = encode_array(m2, v2, wave, sr, chunk_frames=10)
    np.testing.assert_array_equal(idx1, idx2)


# --------------------------------------------------------------------------- #
# Entropy-coded payload (FLAG_ENTROPY)
# --------------------------------------------------------------------------- #
def _skewed_priors(rng, sizes):
    from audio_generation_tpu.entropy import quantize_priors

    return [quantize_priors(rng.gamma(0.3, size=s)) for s in sizes]


def test_entropy_roundtrip_exact(rng):
    idx = _random_indices(rng, 337, SIZES)
    pri = _skewed_priors(rng, SIZES)
    buf = io.BytesIO()
    write_bitstream(buf, idx, SIZES, 24000, 480, 161000, entropy_priors=pri)
    got, meta = read_bitstream(buf.getvalue(), entropy_priors=pri)
    np.testing.assert_array_equal(got, idx)
    assert meta.entropy_coded
    assert meta.coded_bytes > 0
    assert meta.coded_bitrate_bps == pytest.approx(
        8 * meta.coded_bytes * 24000 / (337 * 480)
    )


def test_entropy_smaller_for_skewed_data(rng):
    """In-domain skewed indices: the entropy payload undercuts the packed
    payload — the effective-bitrate story made real."""
    from audio_generation_tpu.entropy import quantize_priors

    T, S = 2000, 1024
    counts = rng.gamma(0.2, size=S)
    p = counts / counts.sum()
    idx = rng.choice(S, size=(T, 2), p=p).astype(np.int32)
    pri = [quantize_priors(counts)] * 2
    packed, coded = io.BytesIO(), io.BytesIO()
    write_bitstream(packed, idx, (S, S), 24000, 480, T * 480)
    write_bitstream(coded, idx, (S, S), 24000, 480, T * 480, entropy_priors=pri)
    assert len(coded.getvalue()) < 0.9 * len(packed.getvalue())


def test_entropy_level_truncation(rng):
    idx = _random_indices(rng, 64, SIZES)
    pri = _skewed_priors(rng, SIZES)
    buf = io.BytesIO()
    write_bitstream(buf, idx, SIZES, 16000, 480, 30000, entropy_priors=pri)
    got, meta = read_bitstream(buf.getvalue(), max_levels=2, entropy_priors=pri)
    np.testing.assert_array_equal(got, idx[:, :2])
    assert meta.codebook_sizes == SIZES[:2]
    assert meta.entropy_coded


def test_entropy_priors_guard(rng):
    """Missing or mismatched priors fail loudly (never garbage audio)."""
    idx = _random_indices(rng, 50, SIZES)
    pri = _skewed_priors(rng, SIZES)
    buf = io.BytesIO()
    write_bitstream(buf, idx, SIZES, 16000, 480, 24000, entropy_priors=pri)
    with pytest.raises(ValueError, match="needs the encoder's model priors"):
        read_bitstream(buf.getvalue())
    wrong = [p.copy() for p in pri]
    wrong[1][7] += 1
    with pytest.raises(ValueError, match="different model snapshot"):
        read_bitstream(buf.getvalue(), entropy_priors=wrong)


def test_read_header_both_modes(rng):
    from audio_generation_tpu.bitstream import read_header

    idx = _random_indices(rng, 64, SIZES)
    pri = _skewed_priors(rng, SIZES)
    packed, coded = io.BytesIO(), io.BytesIO()
    write_bitstream(packed, idx, SIZES, 16000, 480, 30000)
    write_bitstream(coded, idx, SIZES, 16000, 480, 30000, entropy_priors=pri)
    hp = read_header(packed.getvalue())
    hc = read_header(coded.getvalue())  # no priors needed for the header
    assert not hp.entropy_coded and hc.entropy_coded
    assert hp.codebook_sizes == hc.codebook_sizes == SIZES
    assert hp.num_frames == hc.num_frames == 64
    # coded_bytes + header + crc + 4 per-level length words = file size
    assert 32 + 4 * len(SIZES) + 4 + 4 * len(SIZES) + hc.coded_bytes == len(
        coded.getvalue()
    )
    with pytest.raises(ValueError, match="level length"):
        read_header(coded.getvalue()[: 32 + 4 * len(SIZES) + 6])


def test_entropy_codec_end_to_end(codec, rng):
    """Model-derived priors (quantizer.entropy_priors of the checkpoint's
    usage EMA): encode -> decode bit-matches and reconstructs the same
    waveform as the packed stream."""
    from tools.codec_cli import decode_array, encode_array

    model, variables = codec
    qstate = variables["codebook"]["state"]
    pri = model.quantizer.entropy_priors(qstate)
    wave = (rng.normal(size=24 * 40) * 0.3).astype(np.float32)
    idx, meta = encode_array(model, variables, wave, 24000, chunk_frames=10)
    buf = io.BytesIO()
    write_bitstream(buf, idx, **meta, entropy_priors=pri)
    got, _ = read_bitstream(buf.getvalue(), entropy_priors=pri)
    np.testing.assert_array_equal(got, idx)
    y = decode_array(model, variables, got, meta["original_length"],
                     chunk_frames=10)
    assert y.shape == wave.shape
