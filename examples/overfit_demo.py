"""Overfit a single clip — the reference's own smoke methodology
(networks/vae.py:356-393: 50 Adam steps on om.wav, then the codebook-usage
animation). Uses a synthetic 'om'-like harmonic clip so no data is needed.

Run: python examples/overfit_demo.py [n_steps]
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from audio_generation_tpu.data import write_wav
from audio_generation_tpu.data.datasets import overtones
from audio_generation_tpu.models import CausalVQAE
from audio_generation_tpu.utils.codebook_viz import animate_sound


def main(n_steps: int = 50):
    sr = 16000
    om_path = "/root/reference/networks/om.wav"
    try:
        # the reference's actual demo input (float32 WAV; data/wavio reads
        # it natively), cropped to 65280 = 480 * 136 like vae.py:381
        from audio_generation_tpu.data.wavio import read_wav

        wav, sr = read_wav(om_path)
        clip = wav.mean(axis=0)[:65280]
        print(f"using {om_path} ({len(clip) / sr:.2f} s @ {sr} Hz)")
    except (OSError, ValueError):
        # no om.wav around: an 'om'-like sustained harmonic tone
        clip = overtones(65280, freq=136.1, n_overtones=7, sample_rate=sr, peak=0.6)
    x = jnp.asarray(clip.astype(np.float32))[None, None, :]

    model = CausalVQAE(
        in_channels=1, num_quantizers=8, codebook_size=1024,
        input_format="n c l", vq_type="ema",
    )
    variables = model.init(jax.random.key(0), x)
    params, codebook = variables["params"], variables["codebook"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, codebook, opt_state):
        def loss_fn(params):
            (y, commit, _), mut = model.apply(
                {"params": params, "codebook": codebook}, x, True, mutable=["codebook"]
            )
            return jnp.mean((y - x) ** 2) + commit, mut["codebook"]

        (loss, codebook_new), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), codebook_new, opt_state, loss

    for i in range(n_steps):
        params, codebook, opt_state, loss = step(params, codebook, opt_state)
        if i % 10 == 0 or i == n_steps - 1:
            print(f"step {i}: loss {float(loss):.5f}")

    variables = {"params": params, "codebook": codebook}
    (y, _, _), _ = model.apply(variables, x, mutable=["codebook"])
    write_wav("overfit_recon.wav", np.asarray(y)[0], sr)
    print("wrote overfit_recon.wav")

    out = animate_sound(x, model, variables, rate=sr)
    print(f"codebook animation: {out}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 50)
