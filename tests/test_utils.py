"""Host utilities: misc math, metrics writer, codebook viz."""
import os

import numpy as np

from audio_generation_tpu.utils.metrics import MetricsWriter
from audio_generation_tpu.utils.misc import (
    approximate_square_root,
    bitrate_calculator,
    dist_to_uniform,
    get_latest_file,
    interpolate_lists,
    losses_to_running_loss,
    np_softmax,
    tuple_checker,
)


def test_tuple_checker():
    assert tuple_checker(3, 4) == [3, 3, 3, 3]
    assert tuple_checker([1, 2], 2) == [1, 2]
    assert tuple_checker("a", 2) == ["a", "a"]
    import pytest

    with pytest.raises(ValueError):
        tuple_checker([1, 2, 3], 2)


def test_approximate_square_root():
    for n in [512, 1024, 100, 36, 7, 2]:
        a, b = approximate_square_root(n)
        assert a * b == n
    assert approximate_square_root(512) in [(16, 32), (32, 16)]


def test_np_softmax():
    p = np_softmax([1.0, 2.0, 3.0])
    np.testing.assert_allclose(p.sum(), 1.0)
    assert p[2] > p[1] > p[0]


def test_running_loss():
    out = losses_to_running_loss([1.0, 0.0, 0.0], alpha=0.5)
    np.testing.assert_allclose(out, [1.0, 0.5, 0.25])


def test_dist_and_interp():
    d = dist_to_uniform(10, rate=0.05, initial_dist=[2, 0])
    np.testing.assert_allclose(d, [1.5, 0.5])
    f = interpolate_lists([1, 2], [3, 4])
    np.testing.assert_allclose(f(1.0), [1, 2])
    np.testing.assert_allclose(f(0.0), [3, 4])


def test_get_latest_file(tmp_path):
    import time

    assert get_latest_file(str(tmp_path), "model") is None
    p1 = tmp_path / "model_1.pt"
    p1.write_text("a")
    time.sleep(0.01)
    p2 = tmp_path / "model_2.pt"
    p2.write_text("b")
    assert get_latest_file(str(tmp_path), "model") == str(p2)
    assert get_latest_file(str(tmp_path / "nope"), "model") is None


def test_bitrate_calculator(capsys):
    table = bitrate_calculator(480, 24000, 4000)
    out = capsys.readouterr().out
    assert "bitrate of 4000" in out
    # 4000 bps at 50 fps = 80 bits/frame; 8 quantizers -> 2^10 = 1024 entries
    assert table[8] == 1024


def test_metrics_writer(tmp_path):
    path = str(tmp_path / "m.csv")
    w = MetricsWriter(path)
    w.write(1, {"loss": 1.0})
    w.write(2, {"loss": 0.5, "new_metric": 3.0})  # growing column set
    w.flush()
    import csv

    with open(path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2
    assert float(rows[1]["new_metric"]) == 3.0


def test_metrics_writer_resume_append_alignment(tmp_path):
    """A FRESH writer appending to an existing file (checkpoint resume) must
    adopt the on-disk column order — its own field set starts smaller and
    would otherwise misalign columns — and field growth must preserve all
    prior rows."""
    import csv

    path = str(tmp_path / "m.csv")
    w = MetricsWriter(path)
    w.write(1, {"loss": 1.0, "aux": 7.0})
    w.flush()

    w2 = MetricsWriter(path)  # resumed process: fresh (smaller) field set
    w2.write(2, {"aux": 8.0})
    w2.flush()
    with open(path) as f:
        rows = list(csv.DictReader(f))
    assert float(rows[1]["aux"]) == 8.0 and rows[1]["loss"] == ""

    w3 = MetricsWriter(path)  # resumed + grown fields: atomic rewrite
    w3.write(3, {"loss": 0.1, "brand_new": 5.0})
    w3.flush()
    with open(path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 3
    assert float(rows[0]["loss"]) == 1.0  # prior rows preserved
    assert float(rows[2]["brand_new"]) == 5.0
    assert not os.path.exists(path + ".tmp")


def test_sound_to_codebooks(rng):
    import jax
    import jax.numpy as jnp

    from audio_generation_tpu.models import CausalVQAE
    from audio_generation_tpu.utils.codebook_viz import sound_to_codebooks

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
        use_som=True,
        som_kernel_type="hard",
        vq_type="ema",
    )
    x = jnp.asarray(rng.normal(size=(1, 1, 60)).astype(np.float32))
    variables = model.init(jax.random.key(0), x)
    grid = sound_to_codebooks(x, model, variables)
    assert grid.shape == (10, 4, 4)  # 10 latent frames, 4x4 SOM grid
    assert (grid >= 0).all()
    assert grid.sum() > 0


def test_animate_sound_gif_fallback(tmp_path, rng):
    """Without ffmpeg, animate_sound writes an animated GIF + the
    reconstruction wav alongside (reference: utils.py:261-296 muxes an mp4)."""
    import jax
    import jax.numpy as jnp

    from audio_generation_tpu.models import CausalVQAE
    from audio_generation_tpu.utils.codebook_viz import animate_sound

    model = CausalVQAE(
        in_channels=1, n_blocks=2, n_layers_per_block=2,
        first_block_channels=4, num_quantizers=2, codebook_size=16,
        codebook_dim=8, strides=(2, 3), wavelet_decoders=(False, False),
        input_format="n c l", use_som=True, som_kernel_type="hard",
        vq_type="ema",
    )
    x = jnp.asarray(rng.normal(size=(1, 1, 60)).astype(np.float32))
    variables = model.init(jax.random.key(0), x)
    out = animate_sound(
        x, model, variables, rate=60,
        out_path=str(tmp_path / "anim.mp4"), tmp_dir=str(tmp_path),
    )
    assert out is not None
    import shutil

    if shutil.which("ffmpeg") is None:
        assert out.endswith(".gif") and os.path.exists(out)
        assert os.path.exists(str(tmp_path / "anim.wav"))


def test_plot_waveform_and_save_samples(tmp_path, rng):
    import pytest

    pytest.importorskip("matplotlib")
    from audio_generation_tpu.utils.plotting import plot_waveform, save_samples

    wave = rng.normal(size=(1, 1000)).astype(np.float32)
    p = str(tmp_path / "w.png")
    plot_waveform(wave, 16000, p)
    assert os.path.exists(p)
    name = save_samples(wave, wave * 0.5, 0, 1, str(tmp_path), 16000)
    assert os.path.exists(name)
