"""Data pipeline: wav IO, collator laws, datasets, augmentations."""
import os

import numpy as np
import pytest

from audio_generation_tpu.data import (
    CommonVoice,
    SyntheticAudio,
    collate,
    get_dataset,
    introduce_disharmony,
    overtones,
    read_wav,
    simple_mixed_sin,
    write_wav,
)


def test_wav_roundtrip(tmp_path, rng):
    x = (rng.normal(size=(1, 4800)) * 0.5).astype(np.float32)
    path = str(tmp_path / "t.wav")
    write_wav(path, x, 24000)
    y, sr = read_wav(path)
    assert sr == 24000
    assert y.shape == x.shape
    # 16-bit quantization + the 32767/32768 write/read scale mismatch
    np.testing.assert_allclose(y, np.clip(x, -1, 1), atol=1e-4)


def test_wav_stereo(tmp_path, rng):
    x = (rng.normal(size=(2, 1000)) * 0.3).astype(np.float32)
    path = str(tmp_path / "s.wav")
    write_wav(path, x, 16000)
    y, sr = read_wav(path)
    assert y.shape == (2, 1000)
    np.testing.assert_allclose(y, np.clip(x, -1, 1), atol=1e-4)


def test_collate_pad_and_crop(rng):
    short = rng.normal(size=(1, 50)).astype(np.float32)
    long = rng.normal(size=(1, 200)).astype(np.float32)
    exact = rng.normal(size=(1, 100)).astype(np.float32)
    out = collate([short, long, exact], size=100, rng=np.random.default_rng(0))
    assert out.shape == (3, 100)
    # padded short clip: zeros outside a contiguous 50-sample window
    nz = np.flatnonzero(out[0])
    assert nz.size > 0 and nz[-1] - nz[0] < 50
    # exact passes through
    np.testing.assert_array_equal(out[2], exact[0])
    # cropped long clip is a contiguous slice
    found = any(
        np.array_equal(out[1], long[0, s : s + 100]) for s in range(101)
    )
    assert found


def test_collate_resamples(rng):
    x = rng.normal(size=(1, 48000)).astype(np.float32)
    out = collate([x], size=24000, rng=np.random.default_rng(0), resample_from=48000, resample_to=24000)
    assert out.shape == (1, 24000)


def test_synthetic_dataset_deterministic():
    ds = SyntheticAudio(length=1000, n_items=4, seed=1)
    a1, sr, meta = ds[0]
    a2, _, _ = ds[0]
    np.testing.assert_array_equal(a1, a2)
    b, _, _ = ds[1]
    assert not np.array_equal(a1, b)
    assert a1.shape == (1, 1000)
    assert np.abs(a1).max() <= 1.0


def test_commonvoice_tsv(tmp_path, rng):
    os.makedirs(tmp_path / "clips", exist_ok=True)
    rows = ["client_id\tpath\tsentence\tup_votes\tdown_votes\tage\tgender\taccent"]
    for i in range(3):
        wav = (rng.normal(size=(1, 500)) * 0.2).astype(np.float32)
        write_wav(str(tmp_path / "clips" / f"c{i}.wav"), wav, 48000)
        rows.append(f"id{i}\tc{i}.wav\thello\t1\t0\t20\tf\tus")
    with open(tmp_path / "train.tsv", "w") as f:
        f.write("\n".join(rows))
    ds = CommonVoice(str(tmp_path))
    assert len(ds) == 3
    wave, sr, meta = ds[1]
    assert sr == 48000
    assert wave.shape == (1, 500)
    assert meta["client_id"] == "id1"
    assert meta["sentence"] == "hello"


def test_get_dataset_registry():
    ds, sr = get_dataset("synthetic", n_items=2)
    assert sr == 24000 and len(ds) == 2
    with pytest.raises(ValueError):
        get_dataset("nope")


def test_simple_mixed_sin():
    interval = np.arange(-1, 1, 0.01)
    freqs, sins = simple_mixed_sin(5, interval, rng=np.random.default_rng(0))
    assert freqs.shape == (5,)
    assert (np.diff(freqs) >= 0).all()
    assert sins.shape == (1, 1, 200)


def test_overtones():
    x = overtones(1000, 100.0)
    assert x.shape == (1000,)
    np.testing.assert_allclose(np.abs(x).max(), 0.125, rtol=1e-5)


def test_introduce_disharmony(rng):
    x = rng.normal(size=(1, 1, 512)).astype(np.float32)
    y = introduce_disharmony(x, n_segments=4, rng=np.random.default_rng(0))
    assert y.shape == x.shape
    assert not np.allclose(x, y)
    assert np.isfinite(y).all()


def test_prefetch_iterator(rng):
    from audio_generation_tpu.data import prefetch

    batches = [rng.normal(size=(2, 8)).astype(np.float32) for _ in range(5)]
    out = list(prefetch(iter(batches), n_prefetch=2))
    assert len(out) == 5
    for a, b in zip(out, batches):
        np.testing.assert_allclose(np.asarray(a), b)


def test_prefetch_propagates_errors():
    from audio_generation_tpu.data import prefetch

    def bad():
        yield np.zeros((1,), np.float32)
        raise RuntimeError("boom")

    it = prefetch(bad(), n_prefetch=1)
    next(it)
    import pytest

    with pytest.raises(RuntimeError, match="boom"):
        for _ in it:
            pass


def test_parallel_batches_order_and_exceptions():
    from audio_generation_tpu.data.loader import parallel_batches

    out = list(parallel_batches(lambda i: i * i, 7, num_workers=3))
    assert out == [i * i for i in range(7)]
    out = list(parallel_batches(lambda i: i, 5, num_workers=1))
    assert out == list(range(5))

    def boom(i):
        if i == 2:
            raise ValueError("bad batch")
        return i

    import pytest as _pytest

    with _pytest.raises(ValueError, match="bad batch"):
        list(parallel_batches(boom, 4, num_workers=2))


def test_trainer_iterator_deterministic_across_worker_counts(tmp_path):
    """Per-batch RNG streams: the same seed yields identical batches whether
    batches are built by 1 or 4 workers."""
    from audio_generation_tpu.config import ExperimentConfig
    from audio_generation_tpu.train.trainer import Trainer

    def batches(workers):
        cfg = ExperimentConfig.from_dict(
            {
                "experiment_name": f"w{workers}",
                "save_path_root": str(tmp_path) + "/",
                "dataset": "synthetic",
                "sample_rate": 24000,
                "use_discriminator": False,
                "scratch_train": True,
                "vae_args": {
                    "num_quantizers": 2, "codebook_size": 16, "codebook_dim": 8,
                    "first_block_channels": 2, "n_layers_per_block": 2,
                    "strides": [2, 3], "wavelet_decoders": [False, False],
                    "input_format": "n c l",
                },
                "trainer_args": {
                    "batch_size": 2, "accumulation_steps": 2,
                    "crop_size": 24, "data_workers": workers,
                },
            }
        )
        tr = Trainer(cfg)
        it = tr._data_iterator(shuffle=False)
        return [np.asarray(next(it)) for _ in range(3)]

    a = batches(1)
    b = batches(4)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


# --------------------------------------------------------------------------- #
# Native FLAC decoder (native/flac_decoder.cpp via data/flacio.py)
# --------------------------------------------------------------------------- #

def _random_pcm16(rng, channels, length):
    # smooth-ish signal so FIXED predictors produce small residuals, plus
    # noise so rice coding paths with nonzero quotients are exercised
    t = np.arange(length)
    base = (8000 * np.sin(2 * np.pi * 220 * t / 16000)).astype(np.int64)
    x = np.stack([
        np.clip(base + rng.integers(-500, 500, length), -32768, 32767)
        for _ in range(channels)
    ])
    return x.astype(np.int64)


@pytest.mark.parametrize("subframe", ["verbatim", "fixed0", "fixed1", "fixed2"])
def test_flac_roundtrip_exact(tmp_path, rng, subframe):
    """Native decode of spec-valid FLAC streams is sample-exact."""
    from flac_ref_encoder import encode_flac

    from audio_generation_tpu.data.flacio import probe_flac, read_flac

    pcm = _random_pcm16(rng, 1, 5000)
    p = tmp_path / f"t_{subframe}.flac"
    p.write_bytes(encode_flac(pcm, 16000, subframe=subframe))
    ch, sr, bits, total = probe_flac(str(p))
    assert (ch, sr, bits, total) == (1, 16000, 16, 5000)
    wave, sr2 = read_flac(str(p))
    assert sr2 == 16000 and wave.shape == (1, 5000)
    np.testing.assert_array_equal(
        np.round(wave * 32768.0).astype(np.int64), pcm
    )


def test_flac_stereo_roundtrip(tmp_path, rng):
    from flac_ref_encoder import encode_flac

    from audio_generation_tpu.data.flacio import read_flac

    pcm = _random_pcm16(rng, 2, 3000)
    p = tmp_path / "st.flac"
    p.write_bytes(encode_flac(pcm, 24000, subframe="fixed1"))
    wave, sr = read_flac(str(p))
    assert sr == 24000 and wave.shape == (2, 3000)
    np.testing.assert_array_equal(np.round(wave * 32768.0).astype(np.int64), pcm)


def test_librispeech_flac_layout(tmp_path, rng):
    """`dataset: librispeech` trains straight from a flac-layout directory
    (reference ingests the archive as distributed, networks/utils.py:224-226)."""
    from flac_ref_encoder import encode_flac

    from audio_generation_tpu.data.datasets import LibriSpeech

    d = tmp_path / "train-clean-100" / "19" / "198"
    d.mkdir(parents=True)
    for i in range(3):
        pcm = _random_pcm16(rng, 1, 2000 + i)
        (d / f"19-198-{i:04d}.flac").write_bytes(encode_flac(pcm, 16000))
    ds = LibriSpeech(str(tmp_path))
    assert len(ds) == 3
    wave, sr, meta = ds[1]
    assert sr == 16000 and wave.shape == (1, 2001)
    assert meta["path"].endswith(".flac")


# --------------------------------------------------------------------------- #
# PseudoSpeech synthetic dataset
# --------------------------------------------------------------------------- #
def test_pseudo_speech_shape_determinism_and_registry():
    from audio_generation_tpu.data.datasets import PseudoSpeech, get_dataset

    ds = PseudoSpeech(length=24000, n_items=4, seed=11)
    x, sr, meta = ds[2]
    assert x.shape == (1, 24000) and x.dtype == np.float32 and sr == 24000
    assert np.abs(x).max() <= 0.71 and x.std() > 0.01  # normalized, non-silent
    np.testing.assert_array_equal(x, ds[2][0])  # deterministic per (seed, n)
    assert not np.array_equal(x, ds[3][0])      # distinct items

    d, srr = get_dataset("synthetic_speech", n_items=2, length=12000)
    assert srr == 24000 and len(d) == 2 and d[0][0].shape == (1, 12000)


def test_pseudo_speech_is_broadband():
    """The point of the dataset: formant structure above the f0 band (the
    harmonic SyntheticAudio concentrates ~95% of energy under 1 kHz, which
    starves the discriminators — QUALITY_r03.md finding 2)."""
    from audio_generation_tpu.data.datasets import PseudoSpeech

    ds = PseudoSpeech(length=72000, n_items=2, seed=0)
    x, sr, _ = ds[0]
    spec = np.abs(np.fft.rfft(x[0])) ** 2
    freqs = np.fft.rfftfreq(x.shape[1], 1 / sr)
    assert spec[freqs > 1000].sum() / spec.sum() > 0.05


def test_pseudo_speech_item_diagnostics():
    """item_diagnostics exposes the synthesizer's ground truth for metric
    diagnostics (tools/diag_pseudospeech.py): per-sample voicing kind and the
    clean pre-room-noise signal, under the item's exact normalization."""
    from audio_generation_tpu.data.datasets import PseudoSpeech

    ds = PseudoSpeech(length=36000, n_items=4, seed=1234)
    d = ds.item_diagnostics(1)
    x, _, _ = ds[1]
    np.testing.assert_array_equal(d["x"], x[0])  # same item, bit-exact
    assert d["mask"].shape == (36000,) and d["mask"].dtype == np.int8
    assert set(np.unique(d["mask"])) <= {0, 1, 2}
    # the residual x - clean is the i.i.d. room-noise floor: small and flat
    resid = d["x"] - d["clean"]
    assert 0 < resid.std() < 0.05
    # pauses carry (almost) no clean signal energy vs voiced segments (OLA
    # smears 20 ms across boundaries, so compare energies, not exact zeros)
    voiced_rms = np.sqrt(np.mean(d["clean"][d["mask"] == 0] ** 2))
    if (d["mask"] == 2).any():
        pause_rms = np.sqrt(np.mean(d["clean"][d["mask"] == 2] ** 2))
        assert pause_rms < 0.5 * voiced_rms
    # caching returns the same array values
    dsc = PseudoSpeech(length=36000, n_items=4, seed=1234, cache=True)
    np.testing.assert_array_equal(dsc[1][0], x)
