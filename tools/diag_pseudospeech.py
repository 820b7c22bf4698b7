"""Why held-out SI-SDR is floored on PseudoSpeech — and what the honest
number is (round-4 diagnostic; QUALITY_r04 context).

The rvq8_speech flagship reports held-out SI-SDR ~-40 dB while mel-L1/MCD
improve steadily. Hypothesis: PseudoSpeech items contain content that NO
codec below the waveform-transmission rate can waveform-match —
  * unvoiced syllables (~25-35% of samples): fresh i.i.d. highpassed white
    noise, formant-shaped (data/datasets.py PseudoSpeech._synth). A codec
    reproduces the spectral envelope but an uncorrelated noise realization,
    so per-sample SI-SDR there is <= 0 dB regardless of quality;
  * a full-length additive room-noise floor (sigma 0.0015 pre-norm), also
    i.i.d. per item.

This tool quantifies both with the synthesizer's own ground truth
(PseudoSpeech.item_diagnostics): for the committed rvq8_speech snapshot it
reports SI-SDR of the codec reconstruction masked by voicing kind, next to
the ORACLE estimate (the item's clean pre-room-noise signal — the best any
noise-blind reconstruction could do on sample identity). If the codec's
voiced-masked SI-SDR approaches the voiced oracle while unvoiced sits at
<= 0 dB, the global -40 dB is a property of the metric-on-this-data, not of
the codec; perceptual columns (mel/MCD/STOI*) are the meaningful ones.

Writes DIAG_PSEUDOSPEECH_r04.json. Runs on CPU (PYTHONPATH= to skip the TPU
tunnel) so it can run while the TPU queue trains.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SNAP = "artifacts/ckpt/rvq8_speech.npz"
OUT = "DIAG_PSEUDOSPEECH_r04.json"
SR, CROP, N_ITEMS, SEED = 24000, 36000, 16, 1234  # == quality_r04.eval_batch
CHUNK = 4  # CPU-friendly forward batch


def masked_si_sdr_db(ref: np.ndarray, est: np.ndarray, mask: np.ndarray,
                     eps: float = 1e-12) -> float:
    """SI-SDR over the masked sample subset (evaluate.si_sdr_db semantics:
    zero-mean both, project est onto ref). SI-SDR is a per-sample projection
    ratio, so restricting to a subset is well-defined."""
    r = ref[mask].astype(np.float64)
    e = est[mask].astype(np.float64)
    if r.size < 2:
        return float("nan")
    r -= r.mean()
    e -= e.mean()
    alpha = (e @ r) / (r @ r + eps)
    target = alpha * r
    noise = e - target
    return float(10 * np.log10((target @ target) / (noise @ noise + eps) + eps))


def main():
    import jax
    import jax.numpy as jnp

    from audio_generation_tpu.config import ExperimentConfig
    from audio_generation_tpu.data.datasets import PseudoSpeech
    from audio_generation_tpu.train.checkpoint import load_params_npz
    from tools.quality_r04 import CONFIGS

    params, codebook, meta = load_params_npz(SNAP)
    step = int(meta.get("step", 0))
    if step == 0:
        sys.exit(f"{SNAP} is untrained")

    # same model family as the snapshot, f32 compute for the CPU forward
    spec = json.loads(json.dumps(CONFIGS["rvq8_speech"]))
    spec["vae_args"]["compute_dtype"] = "float32"
    cfg = ExperimentConfig.from_dict({
        "experiment_name": "diag", "dataset": "synthetic_speech",
        "sample_rate": SR, "save_path_root": "/tmp/diag_ps/", **spec,
    })
    from audio_generation_tpu.models.vae import model_from_config

    model = model_from_config(cfg.vae)
    variables = {"params": params, "codebook": codebook}

    ds = PseudoSpeech(length=CROP, sample_rate=SR, n_items=N_ITEMS, seed=SEED)
    diags = [ds.item_diagnostics(i) for i in range(N_ITEMS)]
    x = np.stack([d["x"] for d in diags])
    clean = np.stack([d["clean"] for d in diags])
    masks = np.stack([d["mask"] for d in diags])

    stride = model.scale_factor
    L = (CROP // stride) * stride
    x, clean, masks = x[:, :L], clean[:, :L], masks[:, :L]

    fwd = jax.jit(lambda v, w: model.apply(v, w, mutable=["codebook"])[0][0])
    recon = np.concatenate([
        np.asarray(fwd(variables, jnp.asarray(x[i:i + CHUNK][..., None])))[..., 0]
        for i in range(0, N_ITEMS, CHUNK)
    ])

    def best_lag_si_sdr(ref, est, max_lag=256):
        """SI-SDR maximized over integer lags — separates 'misaligned in
        time' from 'wrong waveform'. A large jump vs lag-0 implicates a
        delay/alignment issue in the model or eval, not fidelity."""
        rc = ref - ref.mean()
        ec = est - est.mean()
        xc = np.correlate(ec, rc, "full")  # index L-1+lag: est lags ref by `lag`
        mid = len(rc) - 1
        lo, hi = mid - max_lag, mid + max_lag + 1
        lag = int(np.argmax(np.abs(xc[lo:hi]))) - max_lag
        if lag >= 0:
            r2, e2 = ref[: len(ref) - lag or None], est[lag:]
        else:
            r2, e2 = ref[-lag:], est[: len(est) + lag]
        return lag, masked_si_sdr_db(r2, e2, np.ones(len(r2), bool))

    kinds = {"voiced": 0, "unvoiced": 1, "pause": 2}
    per_item = []
    for i in range(N_ITEMS):
        lag, lag_sdr = best_lag_si_sdr(x[i], recon[i])
        row = {"item": i, "best_lag": lag, "best_lag_si_sdr": lag_sdr,
               "frac": {k: float((masks[i] == v).mean()) for k, v in kinds.items()}}
        for est_name, est in (("codec", recon[i]), ("oracle_clean", clean[i])):
            row[est_name] = {
                "overall": masked_si_sdr_db(x[i], est, np.ones(L, bool)),
                **{k: masked_si_sdr_db(x[i], est, masks[i] == v)
                   for k, v in kinds.items()},
            }
        per_item.append(row)

    def med(path_a, path_b):
        # nanmedian: an item with <2 samples of a kind contributes NaN
        return float(np.nanmedian([r[path_a][path_b] for r in per_item]))

    summary = {
        "snapshot": SNAP, "step": step, "n_items": N_ITEMS,
        "median_best_lag": float(np.median([r["best_lag"] for r in per_item])),
        "median_best_lag_si_sdr_db": float(
            np.nanmedian([r["best_lag_si_sdr"] for r in per_item])),
        "median_si_sdr_db": {
            est: {k: med(est, k) for k in ("overall", "voiced", "unvoiced",
                                           "pause")}
            for est in ("codec", "oracle_clean")
        },
        "mean_kind_fraction": {
            k: float(np.mean([r["frac"][k] for r in per_item])) for k in kinds
        },
        "reading": (
            "oracle_clean = the item's own noiseless synthesis as the "
            "estimate: the SI-SDR ceiling any codec could reach on sample "
            "identity (room floor alone costs ~21 dB overall). MEASURED "
            "verdict (step 39441): the data floor is real but secondary — "
            "codec voiced-masked SI-SDR ~-38 dB vs a +23 dB voiced ceiling, "
            "and allowing a free global time shift only recovers to ~-29 dB "
            "(median best lag ~-20 samples). The flagship matches the "
            "spectral envelope (mel/MCD converge) but not instantaneous "
            "phase on formant-glide material at this training budget; "
            "waveform metrics under-rank it, and the mel/MCD/STOI* columns "
            "carry the quality signal in QUALITY_r04."
        ),
    }
    out = {"summary": summary, "per_item": per_item}
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
