"""Quality metrics sanity."""
import jax
import jax.numpy as jnp
import numpy as np

from audio_generation_tpu.evaluate import (
    codec_bitrate_bps,
    evaluate_codec,
    mel_distance,
    si_sdr_db,
    snr_db,
    stft_distance,
)


def test_snr_perfect_and_noisy(rng):
    x = rng.normal(size=(2, 1000)).astype(np.float32)
    assert float(jnp.mean(snr_db(x, x))) > 100
    noisy = x + 0.1 * rng.normal(size=x.shape).astype(np.float32)
    val = float(jnp.mean(snr_db(x, noisy)))
    assert 15 < val < 25  # ~20 dB for 10% noise


def test_si_sdr_scale_invariant(rng):
    x = rng.normal(size=(1, 1000)).astype(np.float32)
    noisy = x + 0.1 * rng.normal(size=x.shape).astype(np.float32)
    a = float(jnp.mean(si_sdr_db(x, noisy)))
    b = float(jnp.mean(si_sdr_db(x, 3.7 * noisy)))
    np.testing.assert_allclose(a, b, rtol=1e-3)


def test_mel_distance_zero_for_identical(rng):
    x = rng.normal(size=(1, 4096)).astype(np.float32)
    assert float(mel_distance(x, x, 24000, windows=[512])) == 0.0
    y = rng.normal(size=(1, 4096)).astype(np.float32)
    assert float(mel_distance(x, y, 24000, windows=[512])) > 0.1


def test_stft_distance(rng):
    x = rng.normal(size=(1, 4096)).astype(np.float32)
    same = stft_distance(x, x, windows=(512,))
    assert same["spectral_convergence"] < 1e-5
    assert same["log_stft_l1"] < 1e-5
    y = rng.normal(size=(1, 4096)).astype(np.float32)
    diff = stft_distance(x, y, windows=(512,))
    # independent noise: magnitudes differ substantially at every bin
    assert diff["spectral_convergence"] > 0.1
    assert diff["log_stft_l1"] > 0.1
    # scaling the estimate moves log-magnitude by exactly |log s| on average
    half = stft_distance(x, 0.5 * x, windows=(512,))
    np.testing.assert_allclose(half["log_stft_l1"], np.log(2.0), rtol=1e-3)


def test_bitrate():
    # 8 x log2(1024) = 80 bits/frame at 50 fps -> 4000 bps
    assert codec_bitrate_bps(8, 1024, 24000, 480) == 4000.0


def test_evaluate_codec(rng):
    from audio_generation_tpu.models import CausalVQAE

    model = CausalVQAE(
        in_channels=1,
        n_blocks=2,
        n_layers_per_block=2,
        first_block_channels=4,
        num_quantizers=2,
        codebook_size=16,
        codebook_dim=8,
        strides=(2, 3),
        wavelet_decoders=(False, False),
        input_format="n c l",
        use_som=False,
        vq_type="ema",
    )
    x = jnp.zeros((1, 1, 60))
    variables = model.init(jax.random.key(0), x)
    waves = rng.normal(size=(2, 64)).astype(np.float32) * 0.1
    metrics = evaluate_codec(model, variables, waves, 24000)
    assert set(metrics) == {
        "snr_db", "si_sdr_db", "mel_l1", "spectral_convergence",
        "log_stft_l1", "mcd_db", "stoi_proxy", "bitrate_bps", "latent_fps",
        "effective_bitrate_bps", "coded_bitrate_bps",
    }
    assert metrics["effective_bitrate_bps"] <= metrics["bitrate_bps"] + 1e-6
    # real range-coded bytes: positive, and bounded by nominal + coder
    # overhead (a few bytes/level is large relative to this 10-frame batch)
    assert 0 < metrics["coded_bitrate_bps"] < 4 * metrics["bitrate_bps"]
    assert metrics["latent_fps"] == 4000.0
    assert np.isfinite(metrics["snr_db"])
    # codebook_n truncation: deep levels aren't transmitted -> no coded rate
    truncated = evaluate_codec(model, variables, waves, 24000, codebook_n=1)
    assert "coded_bitrate_bps" not in truncated


def test_mcd_zero_for_identical_and_monotone(rng):
    from audio_generation_tpu.evaluate import mcd_db

    t = np.arange(24000, dtype=np.float32) / 24000.0
    x = np.sin(2 * np.pi * 220 * t)[None, :]
    assert mcd_db(x, x, 24000) < 1e-3
    small = x + 0.01 * rng.normal(size=x.shape).astype(np.float32)
    big = x + 0.3 * rng.normal(size=x.shape).astype(np.float32)
    assert 0 < mcd_db(x, small, 24000) < mcd_db(x, big, 24000)


def test_stoi_proxy_bounds_and_monotone(rng):
    from audio_generation_tpu.evaluate import stoi_proxy

    # speech-band modulated noise: envelopes actually vary across segments
    t = np.arange(48000, dtype=np.float32) / 24000.0
    env = 0.5 + 0.5 * np.sin(2 * np.pi * 4 * t)  # 4 Hz syllabic modulation
    x = (env * rng.normal(size=t.shape)).astype(np.float32)[None, :]
    perfect = stoi_proxy(x, x, 24000)
    assert perfect > 0.99
    small = x + 0.1 * rng.normal(size=x.shape).astype(np.float32)
    noise = rng.normal(size=x.shape).astype(np.float32)
    s_small = stoi_proxy(x, small, 24000)
    s_noise = stoi_proxy(x, noise, 24000)
    assert s_noise < s_small <= perfect + 1e-6
    assert -1.0 <= s_noise <= 1.0
