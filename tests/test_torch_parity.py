"""End-to-end torch parity: the reference generator stack (networks/vae.py:
204-305) rebuilt in torch, running the SAME weights as the flax CausalVQAE
(BASELINE.json:5 "tolerance-matched waveform reconstructions")."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

torch = pytest.importorskip("torch")


CFG = dict(
    in_channels=1,
    n_blocks=3,
    n_layers_per_block=4,
    first_block_channels=8,
    codebook_dim=32,
    strides=(2, 3, 4),
)


def build_pair(seed=0):
    from torch_mirror import TorchCodec, transplant

    from audio_generation_tpu.models import CausalVQAE

    model = CausalVQAE(
        n_blocks=CFG["n_blocks"],
        n_layers_per_block=CFG["n_layers_per_block"],
        first_block_channels=CFG["first_block_channels"],
        codebook_dim=CFG["codebook_dim"],
        strides=CFG["strides"],
        wavelet_decoders=tuple([False] * CFG["n_blocks"]),
        input_format="n c l",
        bottleneck="none",
        num_quantizers=2,
        codebook_size=16,
    )
    variables = model.init(jax.random.key(seed), jnp.zeros((1, 1, 240)))
    tm = TorchCodec(**CFG)
    transplant(tm, variables["params"], CFG["n_layers_per_block"])
    tm.eval()
    return model, variables, tm


def test_end_to_end_waveform_parity(rng):
    """Full encoder+decoder stack: same weights, same input -> same waveform
    in torch and flax (tolerance-matched, f32 vs f64 torch ground truth)."""
    model, variables, tm = build_pair()
    x = (rng.normal(size=(2, 1, 24 * 50)) * 0.3).astype(np.float32)

    (y_flax, _, _), _ = jax.jit(
        lambda v, x: model.apply(v, x, mutable=["codebook"])
    )(variables, jnp.asarray(x))
    with torch.no_grad():
        y_torch = tm(torch.from_numpy(x).double()).numpy()

    assert y_flax.shape == y_torch.shape == (2, 1, 24 * 50)
    np.testing.assert_allclose(np.asarray(y_flax), y_torch, rtol=1e-4, atol=1e-5)


def test_encoder_latent_parity(rng):
    """Encoder-only parity at the bottleneck (pre-quantizer latents match)."""
    model, variables, tm = build_pair(seed=1)
    x = (rng.normal(size=(1, 1, 24 * 31 + 7)) * 0.3).astype(np.float32)  # ragged length

    z_flax, _, _ = model.apply(
        variables, jnp.asarray(x), method="encode", mutable=["codebook"]
    )[0]
    with torch.no_grad():
        z_torch = tm.encode(torch.from_numpy(x).double()).numpy()

    # flax encode returns (B, L, D); torch is (B, D, L)
    np.testing.assert_allclose(
        np.asarray(z_flax), z_torch.transpose(0, 2, 1), rtol=1e-4, atol=1e-5
    )


@pytest.mark.slow
def test_parity_survives_training_steps(rng):
    """Parity is not an initialization artifact: after perturbing the flax
    weights (as optimizer steps would), a re-transplant still matches."""
    from torch_mirror import TorchCodec, transplant

    model, variables, _ = build_pair(seed=2)
    # perturb every param deterministically (stand-in for training updates)
    leaves, treedef = jax.tree_util.tree_flatten(variables["params"])
    keys = jax.random.split(jax.random.key(3), len(leaves))
    perturbed = [
        l + 0.05 * jax.random.normal(k, l.shape, l.dtype) for l, k in zip(leaves, keys)
    ]
    params = jax.tree_util.tree_unflatten(treedef, perturbed)
    variables = {"params": params, "codebook": variables.get("codebook", {})}

    tm = TorchCodec(**CFG)
    transplant(tm, params, CFG["n_layers_per_block"])
    tm.eval()

    x = (rng.normal(size=(1, 1, 24 * 40)) * 0.3).astype(np.float32)
    (y_flax, _, _), _ = model.apply(variables, jnp.asarray(x), mutable=["codebook"])
    with torch.no_grad():
        y_torch = tm(torch.from_numpy(x).double()).numpy()
    np.testing.assert_allclose(np.asarray(y_flax), y_torch, rtol=1e-4, atol=1e-5)


def test_wavelet_decoder_waveform_parity(rng):
    """The flagship DEFAULT decodes one block through the WaveletLayer
    (models/vae.py wavelet_decoders[1]); its closed-form two-tap overlap-add
    (audio_generation_tpu/models/wavelets.py:158-189) must match the LITERAL
    reference formulation (wavelet-train materialization +
    unfold(n_points, fold_dim).sum(-1) + tail patch-up,
    networks/wavelets.py:204-231) end to end with transplanted weights."""
    from torch_mirror import TorchCodec, transplant

    from audio_generation_tpu.models import CausalVQAE

    wd = (False, True, True)  # wavelet upsampling on two decoder blocks
    model = CausalVQAE(
        n_blocks=CFG["n_blocks"],
        n_layers_per_block=CFG["n_layers_per_block"],
        first_block_channels=CFG["first_block_channels"],
        codebook_dim=CFG["codebook_dim"],
        strides=CFG["strides"],
        wavelet_decoders=wd,
        input_format="n c l",
        bottleneck="none",
        num_quantizers=2,
        codebook_size=16,
    )
    variables = model.init(jax.random.key(4), jnp.zeros((1, 1, 240)))
    tm = TorchCodec(**CFG, wavelet_decoders=wd)
    transplant(tm, variables["params"], CFG["n_layers_per_block"])
    tm.eval()

    x = (rng.normal(size=(2, 1, 24 * 50)) * 0.3).astype(np.float32)
    (y_flax, _, _), _ = jax.jit(
        lambda v, x: model.apply(v, x, mutable=["codebook"])
    )(variables, jnp.asarray(x))
    with torch.no_grad():
        y_torch = tm(torch.from_numpy(x).double()).numpy()
    assert y_flax.shape == y_torch.shape
    np.testing.assert_allclose(np.asarray(y_flax), y_torch, rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------------- #
# Discriminator parity (VERDICT r3 task 7): reference adversaries
# (networks/discriminator.py:7-197) mirrored in torch, same weights.
# --------------------------------------------------------------------------- #

def test_waveform_discriminator_block_torch_parity(rng):
    from torch_mirror import TorchWaveformDiscBlock, transplant_waveform_block

    from audio_generation_tpu.models.discriminators import (
        WaveformDiscriminatorBlock,
    )

    geom = dict(channel_sizes=(4, 8, 8), kernel_sizes=(15, 41, 5),
                strides=(1, 4, 1), groups=(1, 2, 1))
    block = WaveformDiscriminatorBlock(scale=2, norm="none", **geom)
    x = (rng.normal(size=(2, 3000, 1)) * 0.3).astype(np.float32)
    variables = block.init(jax.random.key(0), jnp.asarray(x))
    score, feats = block.apply(variables, jnp.asarray(x))

    tm = TorchWaveformDiscBlock(scale=2, **geom)
    transplant_waveform_block(tm, variables["params"])
    tm.eval()
    with torch.no_grad():
        tscore, tfeats = tm(torch.from_numpy(x.transpose(0, 2, 1)).double())

    assert len(feats) == len(tfeats)
    np.testing.assert_allclose(
        np.asarray(score)[:, :, 0], tscore.numpy()[:, 0, :],
        rtol=1e-4, atol=1e-6,
    )
    for f, tf in zip(feats, tfeats):
        np.testing.assert_allclose(
            np.asarray(f), tf.numpy().transpose(0, 2, 1), rtol=1e-4, atol=1e-5
        )


def test_stft_discriminator_torch_parity(rng):
    from torch_mirror import TorchSTFTDisc, transplant_stft_disc

    from audio_generation_tpu.models.discriminators import STFTDiscriminator

    disc = STFTDiscriminator(win_length=128, first_channel_size=4, norm="none")
    x = (rng.normal(size=(2, 4096, 1)) * 0.3).astype(np.float32)
    variables = disc.init(jax.random.key(1), jnp.asarray(x))
    scores, feats = disc.apply(variables, jnp.asarray(x))

    tm = TorchSTFTDisc(win_length=128, first_channel_size=4)
    transplant_stft_disc(tm, variables["params"])
    tm.eval()
    with torch.no_grad():
        tscores, tfeats = tm(torch.from_numpy(x.transpose(0, 2, 1)).double())

    assert len(feats) == len(tfeats)
    # ours NHWC (B, T, F, C); torch NCHW (B, C, T, F)
    np.testing.assert_allclose(
        np.asarray(scores[0]), tscores[0].numpy().transpose(0, 2, 3, 1),
        rtol=1e-4, atol=1e-6,
    )
    for f, tf in zip(feats, tfeats):
        np.testing.assert_allclose(
            np.asarray(f), tf.numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-5,
        )


def test_spectral_norm_torch_parity(rng):
    """Our power-iteration spectral norm vs torch.nn.utils.spectral_norm on
    the same conv weight with the SAME persisted u vector: one power
    iteration each, identical normalized output. (sigma is invariant to the
    flax-vs-torch inner flattening order — a column permutation.)"""
    from audio_generation_tpu.models.layers import StridedConv1d

    cin, cout, k = 3, 5, 7
    conv = StridedConv1d(features=cout, kernel_size=k, norm="spectral",
                         use_bias=False)
    x = (rng.normal(size=(2, 64, cin)) * 0.5).astype(np.float32)
    variables = conv.init(jax.random.key(2), jnp.asarray(x))
    u0 = rng.normal(size=(cout,))
    u0 = (u0 / np.linalg.norm(u0)).astype(np.float32)
    variables = {
        "params": variables["params"],
        "spectral": {"u": jnp.asarray(u0)},
    }
    y, mut = conv.apply(variables, jnp.asarray(x), mutable=["spectral"])

    w = np.asarray(variables["params"]["w"], dtype=np.float64)  # (K, Cin, Cout)
    tconv = torch.nn.Conv1d(cin, cout, k, bias=False).double()
    tconv.weight.data = torch.from_numpy(np.ascontiguousarray(w.transpose(2, 1, 0)))
    sn = torch.nn.utils.spectral_norm(tconv, n_power_iterations=1)
    sn.weight_u.data = torch.from_numpy(u0.astype(np.float64))
    sn.train()
    ty = sn(torch.from_numpy(x.transpose(0, 2, 1)).double())

    np.testing.assert_allclose(
        np.asarray(y), ty.detach().numpy().transpose(0, 2, 1),
        rtol=1e-4, atol=1e-5,
    )
    # the persisted u state matches after the iteration as well
    np.testing.assert_allclose(
        np.asarray(mut["spectral"]["u"]), sn.weight_u.numpy(),
        rtol=1e-4, atol=1e-5,
    )


def test_hinge_and_feature_matching_loss_torch_parity(rng):
    """losses.py hinge/adversarial/feature-matching vs a verbatim torch
    implementation of the reference formulas (discriminator.py:199-239)."""
    from audio_generation_tpu import losses as L

    scores_real = [rng.normal(size=(2, 10)).astype(np.float32) for _ in range(3)]
    scores_fake = [rng.normal(size=(2, 10)).astype(np.float32) for _ in range(3)]
    feats_real = [rng.normal(size=(2, 8, 4)).astype(np.float32) for _ in range(5)]
    feats_fake = [rng.normal(size=(2, 8, 4)).astype(np.float32) for _ in range(5)]

    d_ours = float(L.hinge_discriminator_loss(
        [jnp.asarray(s) for s in scores_real],
        [jnp.asarray(s) for s in scores_fake],
    ))
    g_ours = float(L.generator_gan_loss(
        [jnp.asarray(s) for s in scores_fake],
        [jnp.asarray(f) for f in feats_real],
        [jnp.asarray(f) for f in feats_fake],
        feature_multiplier=100.0,
    ))

    # verbatim torch re-derivation (reference discriminator.py:214-239)
    k = len(scores_real)
    d_t, gen_t = 0.0, 0.0
    for xs, ys in zip(scores_real, scores_fake):
        xt, yt = torch.from_numpy(xs), torch.from_numpy(ys)
        real_d = -torch.minimum(xt - 1, torch.zeros_like(xt)).mean()
        fake_d = -torch.minimum(-yt - 1, torch.zeros_like(yt)).mean()
        d_t = d_t + (real_d + fake_d) / k
        gen_t = gen_t + -(yt.mean() / k)
    feat_t = 0.0
    n = len(feats_real)
    for fx, fy in zip(feats_real, feats_fake):
        xt, yt = torch.from_numpy(fx), torch.from_numpy(fy)
        fl = torch.nn.functional.l1_loss(xt, yt) / n
        fl = fl / torch.abs(xt + 1e-3).mean()
        feat_t = feat_t + fl
    g_t = gen_t + 100.0 * feat_t

    np.testing.assert_allclose(d_ours, float(d_t), rtol=1e-5)
    np.testing.assert_allclose(g_ours, float(g_t), rtol=1e-5)
