"""Conditioning layers, Conformer, Snake, and the wavelet-vs-interpolation
quantitative check (the reference's one claim-check, networks/wavelets.py:254-315)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from audio_generation_tpu.models import (
    ConformerBlock,
    FiLM,
    Snake,
    SqueezeExcite,
    WaveletLayer,
)
from audio_generation_tpu.data import simple_mixed_sin
from audio_generation_tpu.ops import snake, upsample_nearest


def test_squeeze_excite(rng):
    layer = SqueezeExcite(scale_factor=2)
    x = jnp.asarray(rng.normal(size=(2, 10, 8)).astype(np.float32))
    variables = layer.init(jax.random.key(0), x)
    y = layer.apply(variables, x)
    assert y.shape == x.shape
    # gating: output is x * sigmoid(...) in (0, 1) elementwise of |x|
    assert (np.abs(np.asarray(y)) <= np.abs(np.asarray(x)) + 1e-6).all()


def test_film_passthrough_and_modulation(rng):
    layer = FiLM()
    x = jnp.asarray(rng.normal(size=(2, 10, 8)).astype(np.float32))
    cond = jnp.asarray(rng.normal(size=(2, 4)).astype(np.float32))
    variables = layer.init(jax.random.key(0), x, cond)
    # None condition -> identity (reference: conditioning.py:42-43)
    np.testing.assert_array_equal(np.asarray(layer.apply(variables, x, None)), np.asarray(x))
    y = layer.apply(variables, x, cond)
    assert y.shape == x.shape
    assert not np.allclose(np.asarray(y), np.asarray(x))


def test_snake_activation():
    x = jnp.linspace(-3, 3, 100)
    y = snake(x, jnp.asarray(1.0))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x + np.sin(x) ** 2), rtol=1e-4, atol=1e-6)
    layer = Snake()
    xb = x.reshape(1, 100, 1)
    variables = layer.init(jax.random.key(0), xb)
    out = layer.apply(variables, xb)
    assert out.shape == xb.shape


def test_conformer_block(rng):
    block = ConformerBlock(dim=16, heads=2)
    x = jnp.asarray(rng.normal(size=(2, 12, 16)).astype(np.float32))
    variables = block.init(jax.random.key(0), x)
    y = block.apply(variables, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_wavelet_beats_interpolation(rng):
    """The reference's quantitative claim (networks/wavelets.py:286-307): a
    trained WaveletLayer upsamples mixed sinusoids better than nearest
    interpolation."""
    scale = 4
    interval = np.arange(-1, 1, 0.01)
    layer = WaveletLayer(
        hidden_channels=16, out_channels=1, scale_factor=scale,
        wavelet_kernel_size=13, n_points=16,
    )
    nprng = np.random.default_rng(0)

    # fixed batch of signals for a fast, deterministic check
    signals = [simple_mixed_sin(10, interval, rng=nprng)[1] for _ in range(8)]
    xs = jnp.asarray(np.concatenate(signals, axis=0).transpose(0, 2, 1))  # (8, 200, 1)
    xs_ds = xs[:, ::scale, :]

    variables = layer.init(jax.random.key(0), xs_ds)
    params = variables["params"]
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(params):
            x_hat = layer.apply({"params": params}, xs_ds)
            return jnp.mean((x_hat - xs) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, loss

    for _ in range(400):
        params, opt, loss = step(params, opt)

    naive = upsample_nearest(xs_ds, scale)
    naive_loss = float(jnp.mean((naive - xs) ** 2))
    assert float(loss) < naive_loss, f"wavelet {float(loss)} !< naive {naive_loss}"


def test_wavelet_closed_form_matches_materialized_overlap_add(rng):
    """The WaveletLayer's two-tap closed form must equal the reference's
    materialized expand + unfold().sum(-1) overlap-add + tail patch-up
    (reference: networks/wavelets.py:211-231)."""
    from audio_generation_tpu.models.wavelets import WaveletLayer

    H, s, n_points = 6, 4, 16
    layer = WaveletLayer(
        hidden_channels=H, out_channels=3, scale_factor=s, n_points=n_points
    )
    x = jnp.asarray(rng.normal(size=(2, 11, 5)), dtype=jnp.float32)
    variables = layer.init(jax.random.key(0), x)
    y = layer.apply(variables, x)

    # naive path, replicated with the layer's own conv_in/conv_out params
    from audio_generation_tpu.ops.conv import same_conv1d

    p = variables["params"]
    h = same_conv1d(x, p["conv_in"]["w"], p["conv_in"]["b"])
    space = jnp.linspace(-10.0, 10.0, n_points)
    kern = jnp.cos(space) * jnp.exp(-(space**2) / p["wavelet_scale"])
    kern = jnp.broadcast_to(kern, (H, n_points))
    train = h[..., None] * kern[None, None]  # (B, L, H, n_points)
    B, L, _ = h.shape
    flat = jnp.swapaxes(train, 2, 3).reshape(B, L * n_points, H)
    fold = n_points // s
    out = jax.lax.reduce_window(
        flat, 0.0, jax.lax.add,
        window_dimensions=(1, n_points, 1), window_strides=(1, fold, 1),
        padding="valid",
    )
    out = jnp.concatenate([out, flat[:, L * n_points - (s - 1):, :]], axis=1)
    out = same_conv1d(out, p["conv_out"]["w"], p["conv_out"]["b"])
    np.testing.assert_allclose(np.asarray(y), np.asarray(out), rtol=2e-5, atol=2e-5)
