"""Discriminator architecture tests (reference: networks/discriminator.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_generation_tpu.models.discriminators import (
    STFTDiscriminator,
    WaveFormDiscriminator,
    build_discriminators,
)


@pytest.fixture(scope="module")
def wave_disc():
    disc = WaveFormDiscriminator()
    x = jnp.zeros((1, 24000, 1))
    variables = disc.init(jax.random.key(0), x)
    return disc, variables


def test_waveform_disc_structure(wave_disc, rng):
    disc, variables = wave_disc
    x = jnp.asarray(rng.normal(size=(2, 24000, 1)).astype(np.float32))
    scores, features = disc.apply(variables, x)
    assert len(scores) == 3  # one per scale block
    assert len(features) == 3 * 8  # pool + 7 convs per block
    for s in scores:  # sigmoid-activated scores in (0, 1)
        arr = np.asarray(s)
        assert (arr > 0).all() and (arr < 1).all()
    # scales halve the pooled length per block
    assert features[8].shape[1] < features[0].shape[1]


def test_waveform_disc_spectral_state(wave_disc, rng):
    disc, variables = wave_disc
    x = jnp.asarray(rng.normal(size=(1, 24000, 1)).astype(np.float32))
    _, mut = disc.apply(variables, x, mutable=["spectral"])
    u_before = jax.tree_util.tree_leaves(variables["spectral"])
    u_after = jax.tree_util.tree_leaves(mut["spectral"])
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(u_before, u_after)
    )
    assert changed, "power iteration should update u"


@pytest.mark.slow
def test_stft_disc_structure(rng):
    disc = STFTDiscriminator(win_length=256)
    x = jnp.asarray(rng.normal(size=(1, 4096, 1)).astype(np.float32))
    variables = disc.init(jax.random.key(0), x)
    scores, features = disc.apply(variables, x)
    assert len(scores) == 1
    assert len(features) == 7  # first conv + 6 blocks
    # frequency axis reduced 2^6 = 64x by the strided blocks
    assert features[-1].shape[2] == 256 // 64
    arr = np.asarray(scores[0])
    assert (arr > 0).all() and (arr < 1).all()


def test_build_discriminators_names():
    discs, names = build_discriminators()
    assert names[0] == "waveform_discriminator"
    assert names[1:] == [
        f"stft_discriminator_{w}" for w in [2048, 1024, 512, 256, 128]
    ]
    assert len(discs) == 6


@pytest.mark.slow
def test_discriminator_trains_toy_gan(rng):
    """Reference-style sanity (discriminator.py:241-297): D learns to
    separate a fixed real signal from noise."""
    import optax

    from audio_generation_tpu import losses as L

    # scaled-down channel bank: the hinge-trainability law doesn't need the
    # full 16..1024 channels, and the full bank dominated suite time (272 s)
    disc = WaveFormDiscriminator(
        n_blocks=1, channel_sizes=(8, 16, 16, 16, 16, 16, 16),
        groups=(1, 4, 4, 4, 4, 1, 1),
    )
    t = np.arange(8192) / 8192
    real_np = np.sin(2 * np.pi * 60 * t).astype(np.float32)[None, :, None]
    real = jnp.asarray(real_np)
    fake = jnp.asarray(rng.normal(size=real_np.shape).astype(np.float32))
    variables = disc.init(jax.random.key(0), real)
    params, spectral = variables["params"], variables["spectral"]
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, spectral, opt):
        def loss_fn(params):
            (sr, _), mut = disc.apply(
                {"params": params, "spectral": spectral}, real, mutable=["spectral"]
            )
            sf, _ = disc.apply({"params": params, "spectral": mut["spectral"]}, fake)
            return L.hinge_discriminator_loss(sr, sf), mut["spectral"]

        (loss, new_spec), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), new_spec, opt, loss

    losses = []
    for _ in range(40):
        params, spectral, opt, loss = step(params, spectral, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
