"""One-command parity evidence (BASELINE.json:5).

Runs two checks and writes PARITY_r{N}.json at the repo root:

  1. **Torch end-to-end waveform parity** — the reference generator stack
     (networks/vae.py:204-305) rebuilt in torch (tools/torch_mirror.py) runs
     the SAME weights as the flax CausalVQAE; records max abs/rel waveform
     error (tolerance bar 1e-4 relative vs float64 torch).
  2. **Backend bit-exact codebook indices** — one fixed clip encoded through
     the flagship RVQ-8 codec on the default backend (the TPU when run in the
     hardware environment) and on the host CPU backend; indices must match
     bit-exactly (f32 HIGHEST-precision distance matmuls make the argmin
     reduction-order independent).

Usage: python tools/parity_check.py [--out PARITY_r02.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def torch_waveform_parity(wavelet_decoders=(False,) * 5):
    import jax
    import jax.numpy as jnp
    import torch

    from audio_generation_tpu.models import CausalVQAE
    from torch_mirror import TorchCodec, transplant

    cfg = dict(
        in_channels=1, n_blocks=5, n_layers_per_block=4, first_block_channels=32,
        codebook_dim=512, strides=(2, 3, 4, 4, 5),
    )
    model = CausalVQAE(
        **{k: v for k, v in cfg.items() if k != "codebook_dim"},
        codebook_dim=cfg["codebook_dim"],
        wavelet_decoders=tuple(wavelet_decoders),
        input_format="n c l",
        bottleneck="none",
        num_quantizers=8,
        codebook_size=1024,
    )
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        variables = jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, 1, 4800)))
        tm = TorchCodec(**cfg, wavelet_decoders=wavelet_decoders)
        transplant(tm, jax.device_get(variables["params"]))
        tm.eval()

        rng = np.random.default_rng(0)
        x = (rng.normal(size=(1, 1, 24000)) * 0.3).astype(np.float32)
        (y_flax, _, _), _ = jax.jit(
            lambda v, x: model.apply(v, x, mutable=["codebook"])
        )(variables, jnp.asarray(x))
        y_flax = np.asarray(y_flax)
    with torch.no_grad():
        y_torch = tm(torch.from_numpy(x).double()).numpy()

    abs_err = float(np.max(np.abs(y_flax - y_torch)))
    scale = float(np.max(np.abs(y_torch)))
    return {
        "max_abs_err": abs_err,
        "output_scale": scale,
        "max_rel_err": abs_err / max(scale, 1e-12),
        "pass": bool(abs_err <= 1e-4 * max(scale, 1.0) + 1e-5),
        "shape": list(y_flax.shape),
    }


def backend_index_parity():
    import jax
    import jax.numpy as jnp

    from audio_generation_tpu.models import CausalVQAE

    model = CausalVQAE(
        in_channels=1, num_quantizers=8, codebook_size=1024, codebook_dim=512,
        input_format="n c l", vq_type="ema", use_som=True, som_kernel_type="hard",
    )
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        variables = jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, 1, 4800)))
        variables = jax.device_get(variables)

    t = np.arange(72000, dtype=np.float32) / 24000.0
    clip = sum(
        a * np.sin(2 * np.pi * f * t)
        for a, f in [(0.4, 220.0), (0.25, 880.0), (0.15, 3520.0)]
    ).astype(np.float32)[None, None, :]

    def encode(device):
        v = jax.device_put(variables, device)
        x = jax.device_put(jnp.asarray(clip), device)
        (z_q, commit, idx), _ = jax.jit(
            lambda v, x: model.apply(v, x, method="encode", mutable=["codebook"])
        )(v, x)
        return np.asarray(idx)

    default_dev = jax.devices()[0]
    idx_default = encode(default_dev)
    idx_cpu = encode(cpu)
    equal = bool(np.array_equal(idx_default, idx_cpu))
    return {
        "default_backend": default_dev.platform,
        "cpu_backend": cpu.platform,
        "frames": int(idx_cpu.shape[1]),
        "num_quantizers": int(idx_cpu.shape[2]),
        "bit_exact": equal,
        "mismatches": 0 if equal else int(np.sum(idx_default != idx_cpu)),
        "pass": equal,
    }


def discriminator_parity():
    """Adversary parity vs torch mirrors (VERDICT r3 task 7): reference-
    geometry (scaled-down) waveform + STFT discriminators and one spectral-
    normalized conv, same weights, same scores/features (reference:
    networks/discriminator.py:7-197)."""
    import jax
    import jax.numpy as jnp
    import torch

    from audio_generation_tpu.models.discriminators import (
        STFTDiscriminator, WaveformDiscriminatorBlock,
    )
    from torch_mirror import (
        TorchSTFTDisc, TorchWaveformDiscBlock, transplant_stft_disc,
        transplant_waveform_block,
    )

    rng = np.random.default_rng(1)
    out = {}
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        geom = dict(channel_sizes=(4, 8, 8), kernel_sizes=(15, 41, 5),
                    strides=(1, 4, 1), groups=(1, 2, 1))
        block = WaveformDiscriminatorBlock(scale=2, norm="none", **geom)
        x = (rng.normal(size=(2, 3000, 1)) * 0.3).astype(np.float32)
        variables = block.init(jax.random.key(0), jnp.asarray(x))
        score, feats = block.apply(variables, jnp.asarray(x))
        tm = transplant_waveform_block(
            TorchWaveformDiscBlock(scale=2, **geom), variables["params"]
        )
        tm.eval()
        with torch.no_grad():
            tscore, tfeats = tm(torch.from_numpy(x.transpose(0, 2, 1)).double())
        ref = tscore.numpy()[:, 0, :]
        err = np.abs(np.asarray(score)[:, :, 0] - ref)
        out["waveform_block_score_max_rel"] = float(
            (err / (np.abs(ref) + 1e-8)).max()
        )
        out["waveform_block_n_features"] = len(feats)

        disc = STFTDiscriminator(win_length=128, first_channel_size=4, norm="none")
        xs = (rng.normal(size=(2, 4096, 1)) * 0.3).astype(np.float32)
        variables = disc.init(jax.random.key(1), jnp.asarray(xs))
        scores, feats = disc.apply(variables, jnp.asarray(xs))
        ts = transplant_stft_disc(
            TorchSTFTDisc(win_length=128, first_channel_size=4),
            variables["params"],
        )
        ts.eval()
        with torch.no_grad():
            tscores, tfeats = ts(torch.from_numpy(xs.transpose(0, 2, 1)).double())
        ref = tscores[0].numpy().transpose(0, 2, 3, 1)
        err = np.abs(np.asarray(scores[0]) - ref)
        out["stft_disc_score_max_rel"] = float((err / (np.abs(ref) + 1e-8)).max())
        out["stft_disc_n_features"] = len(feats)

    out["pass"] = (
        out["waveform_block_score_max_rel"] < 1e-4
        and out["stft_disc_score_max_rel"] < 1e-4
    )
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="PARITY_r04.json")
    args = ap.parse_args()

    report = {
        "torch_waveform_parity": torch_waveform_parity(),
        # the DEFAULT config decodes block 1 through the WaveletLayer
        # (models/vae.py wavelet_decoders=(F,T,F,F,F)); its closed-form
        # rewrite is checked against the literal reference formulation
        # (networks/wavelets.py:204-231) rebuilt in tools/torch_mirror.py
        "torch_waveform_parity_wavelet_default": torch_waveform_parity(
            wavelet_decoders=(False, True, False, False, False)
        ),
        "backend_index_parity": backend_index_parity(),
        "discriminator_parity": discriminator_parity(),
    }
    report["pass"] = bool(
        report["torch_waveform_parity"]["pass"]
        and report["torch_waveform_parity_wavelet_default"]["pass"]
        and report["backend_index_parity"]["pass"]
        and report["discriminator_parity"]["pass"]
    )
    out = os.path.join(os.path.dirname(__file__), "..", args.out)
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    return 0 if report["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
