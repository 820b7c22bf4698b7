"""om.wav round-trip straight from a committed npz snapshot (no run dir).

Like tools/om_demo.py (reference demo anchor: networks/vae.py:377) but
restores from `artifacts/ckpt/<snapshot>.npz` directly, so the GAN-branch
snapshots produced by the sweep/extension campaigns — which have no Orbax
run dir — get audible artifacts too. CPU-friendly (f32, one clip).

Usage: python tools/om_demo_snapshot.py <snapshot_name> [wav_path]
e.g.   python tools/om_demo_snapshot.py ganft_fm50_ext90
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import quality_r04 as q

SR = 24000


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "ganft_fm50_ext90"
    wav_path = (sys.argv[2] if len(sys.argv) > 2
                else "/root/reference/networks/om.wav")

    import jax.numpy as jnp

    from audio_generation_tpu.config import VAEConfig
    from audio_generation_tpu.data.wavio import read_wav, write_wav
    from audio_generation_tpu.evaluate import evaluate_codec
    from audio_generation_tpu.models.vae import model_from_config
    from audio_generation_tpu.ops.signal import resample
    from audio_generation_tpu.train.checkpoint import load_params_npz

    snap = os.path.join(q.SNAP_DIR, f"{name}.npz")
    params, codebook, meta = load_params_npz(snap)
    vae_args = dict(meta.get("vae_args")
                    or q.CONFIGS["rvq8_gan_ft_speech"]["vae_args"])
    vae_args["compute_dtype"] = "float32"
    model = model_from_config(VAEConfig.from_dict(vae_args))
    variables = {"params": params, "codebook": codebook}

    wave, in_sr = read_wav(wav_path)
    mono = np.mean(np.atleast_2d(wave), axis=0) if wave.ndim > 1 else wave
    if in_sr != SR:
        mono = np.asarray(resample(jnp.asarray(mono, jnp.float32), in_sr, SR))
    L = (len(mono) // model.scale_factor) * model.scale_factor
    mono = np.asarray(mono[:L], np.float32)

    m = evaluate_codec(model, variables, mono[None, :], SR)
    # write the reconstruction
    import jax

    x = jnp.asarray(mono)[None, :, None]
    (y, _c, _idx), _ = jax.jit(
        lambda v, x: model.apply(v, x, mutable=["codebook"])
    )(variables, x)
    out_wav = os.path.join(q.OUT_DIR, f"om_recon_{name}.wav")
    write_wav(out_wav, np.asarray(y)[0, :, 0], SR)
    out = {"snapshot": snap, "step": meta.get("step"),
           "input": wav_path, "metrics": {k: round(float(v), 4)
                                          for k, v in m.items()},
           "recon": out_wav}
    with open(os.path.join(q.OUT_DIR, f"om_demo_{name}.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
