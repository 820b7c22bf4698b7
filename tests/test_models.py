"""Model-level tests: shape laws, causality, quantizer plumbing, overfit smoke."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_generation_tpu.models import (
    CausalVQAE,
    CausalMultiresConv1d,
    EnergyTransformer,
    Transformer,
    WaveletLayer,
    alibi_matrix,
)

# small codec for fast tests: stride 2*3*4 = 24
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
def small_model():
    model = CausalVQAE(**SMALL)
    x = jnp.zeros((1, 1, 96))
    variables = model.init(jax.random.key(0), x)
    return model, variables


def test_shape_law_stride(small_model):
    model, variables = small_model
    for L in [96, 97, 240]:
        x = jnp.zeros((2, 1, L))
        y, commit, idx = model.apply(variables, x, mutable=["codebook"])[0]
        lat = -(-L // 24)
        assert y.shape == (2, 1, lat * 24)
        assert idx.shape == (2, lat, 4)


def test_forward_finite(small_model, rng):
    model, variables = small_model
    x = jnp.asarray(rng.normal(size=(2, 1, 96)) * 0.1, dtype=jnp.float32)
    (y, commit, idx), _ = model.apply(x=x, variables=variables, mutable=["codebook"])
    assert np.isfinite(np.asarray(y)).all()
    assert np.isfinite(float(commit))


def test_encoder_causality(small_model, rng):
    """Latent frame t must not depend on future input samples."""
    model, variables = small_model
    x1 = rng.normal(size=(1, 1, 96)).astype(np.float32)
    x2 = x1.copy()
    x2[..., 48:] += 1.0
    z1, _, _ = model.apply(variables, jnp.asarray(x1), method="encode", mutable=["codebook"])[0]
    z2, _, _ = model.apply(variables, jnp.asarray(x2), method="encode", mutable=["codebook"])[0]
    # stride 24: latent frame j sees samples <= j*24; frame 0 sees sample 0 only
    np.testing.assert_allclose(np.asarray(z1)[:, 0], np.asarray(z2)[:, 0], atol=1e-5)


def test_codebook_state_updates(small_model, rng):
    model, variables = small_model
    x = jnp.asarray(rng.normal(size=(1, 1, 96)), dtype=jnp.float32)
    _, mutated = model.apply(variables, x, True, mutable=["codebook"])
    before = np.asarray(variables["codebook"]["state"].ema_counts)
    after = np.asarray(mutated["codebook"]["state"].ema_counts)
    assert not np.array_equal(before, after)


def test_decode_indices_roundtrip(small_model, rng):
    model, variables = small_model
    x = jnp.asarray(rng.normal(size=(1, 1, 96)), dtype=jnp.float32)
    (zq, commit, idx), _ = model.apply(variables, x, method="encode", mutable=["codebook"])
    y1 = model.apply(variables, zq, method="decode")
    y2 = model.apply(variables, idx, method="decode_indices")
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-4, atol=1e-5)


def test_sample(small_model):
    model, variables = small_model
    y = model.apply(variables, jax.random.key(1), 10, method="sample")
    assert y.shape == (1, 1, 240)
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.slow
def test_overfit_smoke(rng):
    """The reference's own verification methodology: overfit a tiny clip with
    MSE + commit loss and watch the loss drop (networks/vae.py:356-393)."""
    import optax

    model = CausalVQAE(**SMALL)
    t = np.arange(96 * 5) / 96.0
    target = (0.5 * np.sin(2 * np.pi * 5 * t)).astype(np.float32)[None, None, :]
    x = jnp.asarray(target)
    variables = model.init(jax.random.key(0), x)
    params = variables["params"]
    codebook = variables["codebook"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, codebook, opt_state):
        def loss_fn(params):
            (y, commit, _), mut = model.apply(
                {"params": params, "codebook": codebook},
                x,
                True,
                mutable=["codebook"],
            )
            return jnp.mean((y - x) ** 2) + commit, mut["codebook"]

        (loss, new_codebook), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, new_codebook, opt_state, loss

    losses = []
    for _ in range(200):
        params, codebook, opt_state, loss = step(params, codebook, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    # quantized training converges slower than unbottlenecked (the codebook
    # must settle first); 200 steps roughly halves the loss on this fixture
    assert losses[-1] < losses[0] * 0.6, f"no learning: {losses[0]} -> {losses[-1]}"


def test_wavelet_layer_shape(rng):
    layer = WaveletLayer(hidden_channels=8, out_channels=3, scale_factor=4, n_points=16)
    x = jnp.asarray(rng.normal(size=(2, 10, 5)), dtype=jnp.float32)
    variables = layer.init(jax.random.key(0), x)
    y = layer.apply(variables, x)
    assert y.shape == (2, 40, 3)


def test_multires_conv_shape(rng):
    layer = CausalMultiresConv1d(channels=6, kernel_size=5, depth=3)
    x = jnp.asarray(rng.normal(size=(2, 32, 6)), dtype=jnp.float32)
    variables = layer.init(jax.random.key(0), x)
    y = layer.apply(variables, x)
    assert y.shape == (2, 32, 6)


def test_multires_conv_causal(rng):
    layer = CausalMultiresConv1d(channels=3, kernel_size=5, depth=3)
    x1 = rng.normal(size=(1, 64, 3)).astype(np.float32)
    x2 = x1.copy()
    x2[:, 32:] += 5.0
    variables = layer.init(jax.random.key(0), jnp.asarray(x1))
    y1 = layer.apply(variables, jnp.asarray(x1))
    y2 = layer.apply(variables, jnp.asarray(x2))
    np.testing.assert_allclose(np.asarray(y1)[:, :32], np.asarray(y2)[:, :32], atol=1e-5)


def test_alibi_matrix_properties():
    M = alibi_matrix(8, n_heads=4)
    assert M.shape == (4, 8, 8)
    assert (np.diagonal(M, axis1=1, axis2=2) == 0).all()
    # distance-proportional penalty, symmetric
    np.testing.assert_allclose(M[:, 0, 1], M[:, 1, 0])
    assert (M[:, 0, 5] < M[:, 0, 1]).all()
    # cross-attention: asymmetric contexts
    M2 = alibi_matrix(8, 4, n_heads=2)
    assert M2.shape == (2, 8, 4)


def test_transformer_forward(rng):
    model = Transformer(dim=16, depth=2, heads=2, head_dim=8, context_x=12)
    x = jnp.asarray(rng.normal(size=(2, 12, 16)), dtype=jnp.float32)
    variables = model.init(jax.random.key(0), x)
    y = model.apply(variables, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_transformer_cross_attention(rng):
    model = Transformer(dim=16, depth=2, heads=2, head_dim=8, context_x=12, context_y=6)
    x = jnp.asarray(rng.normal(size=(1, 12, 16)), dtype=jnp.float32)
    y_in = jnp.asarray(rng.normal(size=(1, 6, 16)), dtype=jnp.float32)
    variables = model.init(jax.random.key(0), x, y_in)
    out = model.apply(variables, x, y_in)
    assert out.shape == x.shape


def test_energy_transformer_descends_energy(rng):
    model = EnergyTransformer(dim=16, n_heads=2, head_dim=8, n_iters=8, step_size=0.05)
    x = jnp.asarray(rng.normal(size=(1, 6, 16)), dtype=jnp.float32)
    variables = model.init(jax.random.key(0), x)
    out, aux = model.apply(variables, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    # more iterations should not change shape / blow up
    model2 = EnergyTransformer(dim=16, n_heads=2, head_dim=8, n_iters=16, step_size=0.05)
    out2, _ = model2.apply(variables, x)
    assert np.isfinite(np.asarray(out2)).all()


def test_energy_bottleneck_in_vqae(rng):
    cfg = dict(SMALL)
    cfg["bottleneck"] = "energy"
    cfg["energy_kwargs"] = None
    model = CausalVQAE(**cfg)
    x = jnp.asarray(rng.normal(size=(1, 1, 96)) * 0.1, dtype=jnp.float32)
    variables = model.init(jax.random.key(0), x)
    (y, aux, idx), _ = model.apply(variables, x, mutable=["codebook"])
    assert y.shape == (1, 1, 96)
    assert np.isfinite(np.asarray(y)).all()


def test_energy_bottleneck_differentiable(rng):
    """Training through the energy descent needs grad-of-grad — native in JAX."""
    cfg = dict(SMALL)
    cfg["bottleneck"] = "energy"
    model = CausalVQAE(**cfg)
    x = jnp.asarray(rng.normal(size=(1, 1, 96)) * 0.1, dtype=jnp.float32)
    variables = model.init(jax.random.key(0), x)

    def loss_fn(params):
        (y, aux, _), _ = model.apply(
            {"params": params, **{k: v for k, v in variables.items() if k != "params"}},
            x,
            mutable=["codebook"],
        )
        return jnp.mean((y - x) ** 2)

    g = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(t)).all() for t in flat)
    assert any(np.abs(np.asarray(t)).sum() > 0 for t in flat)


def test_pallas_rvq_model_path(rng):
    """use_pallas_rvq=True (interpret on CPU) matches the scan quantizer."""
    import dataclasses as dc

    from audio_generation_tpu.ops import rvq_pallas

    model = CausalVQAE(**SMALL)
    x = jnp.asarray(rng.normal(size=(1, 1, 96)).astype(np.float32))
    variables = model.init(jax.random.key(0), x)
    (zq_ref, _, idx_ref), _ = model.apply(variables, x, method="encode", mutable=["codebook"])

    fast = dc.replace(model, use_pallas_rvq=True)
    orig = rvq_pallas.rvq_encode
    try:
        # force interpret mode on CPU
        rvq_pallas.rvq_encode = lambda f, cb, **kw: orig(f, cb, tile_n=32, interpret=True)
        (zq_fast, _, idx_fast), _ = fast.apply(variables, x, method="encode", mutable=["codebook"])
    finally:
        rvq_pallas.rvq_encode = orig
    np.testing.assert_array_equal(np.asarray(idx_fast), np.asarray(idx_ref))
    np.testing.assert_allclose(np.asarray(zq_fast), np.asarray(zq_ref), rtol=1e-5, atol=1e-6)


def test_energy_rvq_bottleneck_is_a_real_codec(rng):
    """'energy_rvq' codes the post-descent tokens with the RVQ cascade
    (VERDICT r3 task 8): real indices, decode_indices round-trip, and
    straight-through gradients reaching the encoder."""
    import jax
    import jax.numpy as jnp
    from audio_generation_tpu.models import CausalVQAE

    model = CausalVQAE(
        in_channels=1, n_blocks=2, n_layers_per_block=2,
        first_block_channels=4, num_quantizers=2, codebook_size=16,
        codebook_dim=8, strides=(2, 3), wavelet_decoders=(False, False),
        input_format="b l c", use_som=False, vq_type="ema",
        bottleneck="energy_rvq",
        energy_kwargs={"n_iters": 2, "n_heads": 2, "head_dim": 4},
    )
    x = jnp.asarray(rng.normal(size=(2, 60, 1)) * 0.1, jnp.float32)
    variables = model.init(jax.random.key(0), x)
    (y, commit, idx), _ = model.apply(variables, x, mutable=["codebook"])
    assert y.shape == x.shape
    assert idx.shape == (2, 10, 2)
    # indices are non-degenerate (more than one codeword in play)
    assert len(np.unique(np.asarray(idx))) > 1

    # the coded-transmission path: indices alone -> waveform
    y2 = model.apply(variables, idx, method="decode_indices")
    assert y2.shape == y.shape
    # decode_indices uses the same dequantize+decode as the forward
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), rtol=1e-4, atol=1e-5)

    # gradient flows through descent + straight-through to encoder params
    def loss(params):
        (yy, cc, _), _ = model.apply(
            {"params": params, "codebook": variables["codebook"]},
            x, mutable=["codebook"],
        )
        return jnp.mean(yy**2) + cc

    grads = jax.grad(loss)(variables["params"])
    stem = jax.tree_util.tree_leaves(grads["enc_stem"])
    assert any(float(jnp.abs(g).sum()) > 0 for g in stem)
    # the energy module's own params also receive gradient (via commit/recon)
    ekey = [k for k in grads if "energy" in k.lower()]
    assert ekey, f"energy params missing from grads: {list(grads)}"
