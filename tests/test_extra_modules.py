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
