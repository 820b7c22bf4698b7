"""Real-audio reconstruction demo on the reference's own smoke-test input.

The reference demos its codec by round-tripping `networks/om.wav`
(reference: networks/vae.py:377, networks/datasets.py:142 — a 4.1 s stereo
16 kHz chant). This tool does the same with a TRAINED checkpoint from the
QUALITY_r03 campaign: load om.wav (float32 WAV via data/wavio), mono-mix,
polyphase-resample 16k -> 24k (ops/signal.resample), encode+decode, and
write the reconstruction + metrics to QUALITY_r03/.

Usage: python tools/om_demo.py [config_name=rvq8_gan_hifi] [wav_path] [--animate]
  --animate also renders the codebook-usage animation (GIF without ffmpeg)
  from the trained checkpoint (reference: utils.py:261-296 animate_sound).
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT_DIR = "QUALITY_r03"
SR = 24000


def main():
    argv = [a for a in sys.argv[1:] if a != "--animate"]
    animate = "--animate" in sys.argv[1:]
    name = argv[0] if len(argv) > 0 else "rvq8_gan_hifi"
    wav_path = argv[1] if len(argv) > 1 else "/root/reference/networks/om.wav"

    # round-4 configs live in quality_r04 (same config/ckpt layout); prefer
    # the r04 registry — the rvq8_speech pair is registered in BOTH (it was
    # staged in quality_r03 for round 4), and the trained run dirs are r04's
    global OUT_DIR
    from tools import quality_r03, quality_r04

    if name in quality_r04.CONFIGS:
        CONFIGS = quality_r04.CONFIGS
        OUT_DIR = quality_r04.OUT_DIR
    else:
        CONFIGS = quality_r03.CONFIGS

    from audio_generation_tpu.config import ExperimentConfig
    from audio_generation_tpu.data.wavio import read_wav, write_wav
    from audio_generation_tpu.evaluate import evaluate_codec
    from audio_generation_tpu.ops.signal import resample
    from audio_generation_tpu.train.trainer import Trainer

    spec = json.loads(json.dumps(CONFIGS[name]))
    spec["vae_args"]["compute_dtype"] = "bfloat16"
    cfg = ExperimentConfig.from_dict(
        {
            "experiment_name": name,
            "dataset": "synthetic",
            "sample_rate": SR,
            "scratch_train": False,  # resume = load the trained checkpoint
            "save_path_root": os.path.join(OUT_DIR, "runs") + "/",
            **spec,
        }
    )
    trainer = Trainer(cfg)
    step = int(trainer.state.step)
    if step == 0 and name in quality_r04.CONFIGS:
        # the Orbax run dir lives outside git and VM resets wipe it; the
        # committed artifacts/ckpt/<name>.npz snapshot is the durable copy
        step = quality_r04.restore_trainer_from_snapshot(trainer, name)
    if step == 0:
        sys.exit(f"{name} has no trained checkpoint or snapshot — refusing "
                 "to demo an untrained model")
    print(f"loaded {name} at step {step}")

    x, sr = read_wav(wav_path)
    mono = x.mean(axis=0)
    if sr != SR:
        mono = np.asarray(resample(mono, sr, SR), dtype=np.float32)
    stride = trainer.model.scale_factor
    L = (len(mono) // stride) * stride
    mono = mono[:L]

    y = trainer.reconstruct(mono)
    m = evaluate_codec(trainer.model, trainer._variables(), mono[None, :], SR)

    base = os.path.splitext(os.path.basename(wav_path))[0]
    write_wav(os.path.join(OUT_DIR, f"{base}_orig_{SR//1000}k.wav"), mono, SR)
    write_wav(os.path.join(OUT_DIR, f"{base}_recon_{name}.wav"), y, SR)
    result = {
        "config": name,
        "step": step,
        "input": wav_path,
        "seconds": round(L / SR, 3),
        **{k: round(float(v), 4) for k, v in m.items()},
    }
    with open(os.path.join(OUT_DIR, f"{base}_demo_{name}.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))

    if animate:
        from audio_generation_tpu.utils.codebook_viz import animate_sound

        x_model = trainer.steps._model_input(mono[None, :].astype(np.float32))
        out = animate_sound(
            x_model, trainer.model, trainer._variables(), rate=SR,
            out_path=os.path.join(OUT_DIR, f"{base}_codebooks_{name}.mp4"),
            tmp_dir=OUT_DIR,
        )
        print(f"codebook animation: {out}")


if __name__ == "__main__":
    main()
