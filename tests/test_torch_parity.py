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
