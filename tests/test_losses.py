"""Loss formula goldens (reference formulas: networks/training.py:51-78,
networks/discriminator.py:199-239)."""
import jax
import jax.numpy as jnp
import numpy as np

from audio_generation_tpu import losses as L
from audio_generation_tpu.ops.stft import make_mel_bank


def test_multispectral_zero_for_identical(rng):
    x = jnp.asarray(rng.normal(size=(2, 2048)).astype(np.float32))
    bank = make_mel_bank(24000, [32, 64])
    loss = L.multispectral_reconstruction_loss(x, x, bank, windows=[32, 64])
    assert float(loss) == 0.0


def test_multispectral_positive_and_alpha_scaling(rng):
    x = jnp.asarray(rng.normal(size=(1, 2048)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(1, 2048)).astype(np.float32))
    bank = make_mel_bank(24000, [32])
    with_alpha = float(L.multispectral_reconstruction_loss(x, y, bank, windows=[32]))
    without = float(
        L.multispectral_reconstruction_loss(x, y, bank, windows=[32], scale_alpha=False)
    )
    assert with_alpha > 0 and without > 0
    # alpha = sqrt(32/2) = 4 > 1 so the log-l2 term is amplified
    assert with_alpha > without


def test_reconstruction_loss_preemphasis():
    x = jnp.asarray(np.ones((1, 100), np.float32))
    y = jnp.zeros((1, 100))
    # pre-emphasized ones = [1, 0.03, 0.03, ...]
    expected = 10.0 * np.mean(
        np.concatenate([[1.0], np.full(99, 0.03)]) ** 2
    )
    got = float(L.reconstruction_loss(x, y, pre_emphasis=0.97, weight=10.0))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_hinge_loss_signs():
    # perfect discriminator: real >= 1, fake <= -1 -> zero loss
    real = [jnp.full((2, 5, 1), 2.0)]
    fake = [jnp.full((2, 5, 1), -2.0)]
    assert float(L.hinge_discriminator_loss(real, fake)) == 0.0
    # fooled discriminator: real = -1, fake = +1 -> loss = 2 + 2 = 4
    real = [jnp.full((2, 5, 1), -1.0)]
    fake = [jnp.full((2, 5, 1), 1.0)]
    np.testing.assert_allclose(float(L.hinge_discriminator_loss(real, fake)), 4.0)
    # averaged over k levels
    loss2 = L.hinge_discriminator_loss(real * 2, fake * 2)
    np.testing.assert_allclose(float(loss2), 4.0)


def test_adversarial_generator_loss():
    fake = [jnp.full((1, 4, 1), 0.5), jnp.full((1, 4, 1), 1.5)]
    np.testing.assert_allclose(
        float(L.adversarial_generator_loss(fake)), -(0.5 + 1.5) / 2
    )


def test_feature_matching_scaled(rng):
    f_real = [jnp.asarray(rng.normal(size=(1, 8, 4)).astype(np.float32))]
    f_fake = [f_real[0] + 1.0]
    loss = float(L.feature_matching_loss(f_real, f_fake))
    expected = 1.0 / np.mean(np.abs(np.asarray(f_real[0]) + 1e-3))
    np.testing.assert_allclose(loss, expected, rtol=1e-5)


def test_feature_matching_grad_does_not_touch_real(rng):
    """Real features are targets: no gradient may flow through them."""
    fr = jnp.asarray(rng.normal(size=(1, 8)).astype(np.float32))
    ff = jnp.asarray(rng.normal(size=(1, 8)).astype(np.float32))

    g = jax.grad(lambda fr: L.feature_matching_loss([fr], [ff]))(fr)
    np.testing.assert_array_equal(np.asarray(g), 0.0)
