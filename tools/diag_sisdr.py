"""Diagnose the r2 SI-SDR plateau: load the quality_rvq8_long checkpoint,
reconstruct a held-out batch, and decompose the error by lag and by band.

Hypothesis (from metrics.csv): the pre-emphasized waveform MSE is ~0 while
SI-SDR is -30 dB, i.e. the codec has matched the pre-emphasized (high-pass)
signal but not the low-frequency phase that dominates raw energy — because
pre-emphasis (0.97) attenuates the synthetic data's 80-300 Hz fundamentals
by ~26-32 dB before the only phase-sensitive loss sees them.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp

    from audio_generation_tpu.config import ExperimentConfig
    from audio_generation_tpu.evaluate import si_sdr_db, snr_db
    from audio_generation_tpu.train.trainer import Trainer

    SR, CROP = 24000, 36000
    cfg = ExperimentConfig.from_dict(
        {
            "experiment_name": "quality_rvq8_long",
            "dataset": "synthetic",
            "sample_rate": SR,
            "save_path_root": "QUALITY_r02/runs/",
            "use_discriminator": False,
            "vae_args": {"num_quantizers": 8},
            "trainer_args": {"batch_size": 8, "accumulation_steps": 1,
                             "mini_epoch_length": 32, "crop_size": CROP},
            "train_run_args": {"epochs": 0, "gan_loss": False},
        }
    )
    tr = Trainer(cfg)
    assert int(tr.state.step) > 0, "checkpoint did not resume"

    from audio_generation_tpu.data.datasets import SyntheticAudio

    ds = SyntheticAudio(length=CROP, sample_rate=SR, n_items=8, seed=1234)
    x = np.stack([np.asarray(ds[i][0])[0] for i in range(len(ds))])

    import jax

    fwd = tr._jitted_forward
    y, _, _ = fwd(tr._variables(), tr.steps._model_input(jnp.asarray(x)))
    y = np.asarray(tr.steps._to_wave(y))

    print(f"step={int(tr.state.step)}")
    print(f"raw  SNR {float(np.mean(np.asarray(snr_db(x, y)))):+.2f} dB   "
          f"SI-SDR {float(np.mean(np.asarray(si_sdr_db(x, y)))):+.2f} dB")

    # best-lag SI-SDR: is there a constant misalignment?
    best = (-1e9, 0)
    for lag in range(-960, 961, 4):
        if lag >= 0:
            a, b = x[:, lag:], y[:, : y.shape[1] - lag]
        else:
            a, b = x[:, :lag], y[:, -lag:]
        v = float(np.mean(np.asarray(si_sdr_db(a, b))))
        if v > best[0]:
            best = (v, lag)
    print(f"best-lag SI-SDR {best[0]:+.2f} dB at lag {best[1]}")

    # band decomposition: SNR of lowpassed vs highpassed residual
    X = np.fft.rfft(x, axis=-1)
    Y = np.fft.rfft(y, axis=-1)
    freqs = np.fft.rfftfreq(x.shape[-1], 1 / SR)
    for lo, hi in [(0, 500), (500, 1500), (1500, 4000), (4000, 12000)]:
        m = (freqs >= lo) & (freqs < hi)
        sig = np.sum(np.abs(X[:, m]) ** 2)
        err = np.sum(np.abs(X[:, m] - Y[:, m]) ** 2)
        # coherence: how much of the error is phase vs magnitude
        mag_err = np.sum((np.abs(X[:, m]) - np.abs(Y[:, m])) ** 2)
        print(f"band {lo:5d}-{hi:5d} Hz: SNR {10*np.log10(sig/(err+1e-12)):+7.2f} dB"
              f"  (magnitude-only SNR {10*np.log10(sig/(mag_err+1e-12)):+7.2f} dB,"
              f" share of signal {sig/np.sum(np.abs(X)**2)*100:5.1f}%)")

    # what the pre-emphasis filter does to this data
    pre = x[:, 1:] - 0.97 * x[:, :-1]
    print(f"pre-emphasized/raw power ratio: "
          f"{np.mean(pre**2)/np.mean(x**2):.5f} "
          f"({10*np.log10(np.mean(pre**2)/np.mean(x**2)):.1f} dB)")


if __name__ == "__main__":
    main()
