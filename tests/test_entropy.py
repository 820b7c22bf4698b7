"""Range coder + seeded-adaptive model: exactness, bounds, compression."""
import math

import numpy as np
import pytest

from audio_generation_tpu.entropy import (
    ADAPT_INC,
    PRIOR_SCALE,
    RangeDecoder,
    RangeEncoder,
    SeededAdaptiveModel,
    decode_level,
    encode_level,
    priors_crc,
    quantize_priors,
)


def test_raw_coder_roundtrip_fuzz(rng):
    """Static-model coding is exact for random tables/symbols/lengths."""
    for _ in range(60):
        S = int(rng.integers(2, 300))
        freqs = rng.integers(1, 50, size=S).astype(np.int64)
        T = int(rng.integers(0, 300))
        syms = rng.integers(0, S, size=T)
        cumsum = np.concatenate([[0], np.cumsum(freqs)])
        tot = int(cumsum[-1])
        enc = RangeEncoder()
        for s in syms:
            enc.encode(int(cumsum[s]), int(freqs[s]), tot)
        blob = enc.finish()
        dec = RangeDecoder(blob)
        for want in syms:
            t = dec.decode_target(tot)
            s = int(np.searchsorted(cumsum, t, side="right")) - 1
            dec.advance(int(cumsum[s]), int(freqs[s]))
            assert s == want


def test_seeded_adaptive_roundtrip(rng):
    """Level coding is exact, including when the data distribution differs
    from the prior (the adaptive model must keep both sides in lockstep)."""
    for trial in range(30):
        S = int(rng.integers(2, 1025))
        counts = rng.gamma(0.3, size=S)
        pri = quantize_priors(counts)
        T = int(rng.integers(0, 1500))
        p = counts if trial % 2 == 0 else rng.gamma(0.3, size=S)
        p = p / p.sum()
        syms = rng.choice(S, size=T, p=p).astype(np.int64)
        back = decode_level(encode_level(syms, pri), T, pri)
        np.testing.assert_array_equal(back, syms.astype(np.int32))


def test_compression_beats_packing(rng):
    """In-domain skewed data codes near its entropy, well under the packed
    ceil(log2(S)) rate the AGC1 packed payload pays."""
    S, T = 1024, 8000
    counts = rng.gamma(0.2, size=S)
    p = counts / counts.sum()
    syms = rng.choice(S, size=T, p=p)
    blob = encode_level(syms, quantize_priors(counts))
    bits_per_sym = len(blob) * 8 / T
    entropy = -(p * np.log2(np.maximum(p, 1e-30))).sum()
    assert bits_per_sym < math.ceil(math.log2(S))  # beats bit-packing
    assert bits_per_sym < entropy + 0.5  # and sits near the entropy


def test_adaptation_bounds_prior_mismatch(rng):
    """Worst case (uniform data, skewed prior): adaptation caps the overhead
    at well under 2 bits/symbol over the packed rate instead of letting a
    wrong prior compound forever."""
    S, T = 1024, 8000
    pri = quantize_priors(rng.gamma(0.2, size=S))
    syms = rng.integers(0, S, size=T)
    blob = encode_level(syms, pri)
    assert len(blob) * 8 / T < math.ceil(math.log2(S)) + 2


def test_quantize_priors_bounds(rng):
    """Every symbol keeps mass >= 1 (codability of unseen symbols) and the
    total respects the coder's 2**16 bound; degenerate inputs fall back to
    uniform."""
    for counts in (
        rng.gamma(0.1, size=1024),
        np.zeros(64),
        np.array([np.inf, 1.0, 0.0]),
        np.array([1e30, 1e-30]),
        np.full(7, np.nan),
    ):
        f = quantize_priors(counts)
        assert (f >= 1).all()
        assert int(f.sum()) <= PRIOR_SCALE + len(f)
    np.testing.assert_array_equal(quantize_priors(np.zeros(5)), np.ones(5))


def test_model_rescale_keeps_total_bounded():
    m = SeededAdaptiveModel(np.ones(4, dtype=np.int64))
    for _ in range(50000):
        m.update(1)
        assert m.total <= (1 << 16)
        assert (m.freqs >= 1).all()
        assert m.total == int(m.freqs.sum())
    # the hot symbol dominates but the cold ones stay codable
    assert m.freqs[1] > m.freqs[0] >= 1


def test_priors_crc_discriminates():
    a = [np.array([3, 2, 1], np.int64), np.array([5, 5], np.int64)]
    b = [np.array([3, 2, 1], np.int64), np.array([5, 6], np.int64)]
    assert priors_crc(a) == priors_crc([x.copy() for x in a])
    assert priors_crc(a) != priors_crc(b)


def test_adapt_inc_vs_rescale_headroom():
    """Format constants must satisfy the coder invariant total <= 2**16."""
    assert PRIOR_SCALE + 2048 < (1 << 16) - 2 * ADAPT_INC


def test_encode_level_validates_range():
    with pytest.raises(ValueError, match="out of range"):
        encode_level(np.array([4]), np.ones(4, np.int64))
    assert encode_level(np.zeros(0), np.ones(4, np.int64)) == b""
    assert decode_level(b"", 0, np.ones(4, np.int64)).shape == (0,)
