"""QUALITY_r03 — the round-3 flagship training campaign (VERDICT.md task 1).

Long, resumable TPU training runs per config with in-loop SI-SDR/SNR/mel
trajectories (trainer eval hooks -> metrics.csv), wall-clock-budgeted so the
campaign fits the round:

  rvq8_hifi      no-GAN RVQ-8 flagship, waveform-loss weighting fixed
                 (reference reconstruction_loss_weight=100 + raw MSE term;
                 see CONVERGE_r03.json / tools/diag_sisdr.py)
  rvq8_gan_hifi  the same codec trained adversarially (one-sampled
                 discriminator, full bank) at matched wall-clock
  energy_hifi    energy-transformer bottleneck at matched wall-clock
                 (re-tests reference README.md:56 "much stronger than RVQ")

Each run is checkpointed (Orbax) and RESUMES when the script is re-invoked,
so the campaign survives interruptions. Artifacts per config:
QUALITY_r03/<name>.json, reconstruction + unconditional-sample wavs, and the
full metrics.csv trajectory under QUALITY_r03/runs/<name>/.

Usage:
  python tools/quality_r03.py [--hours-per-config H] [names...]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT_DIR = "QUALITY_r03"
SR, CROP = 24000, 36000

BASE_TRAINER = {
    "batch_size": 8,
    "accumulation_steps": 1,
    "mini_epoch_length": 32,
    "crop_size": CROP,
    "reconstruction_loss_weight": 100.0,  # the reference config value
    # (reference config/training.yml:28); round-2 runs used the code default
    # 10 and plateaued at SI-SDR -30 dB (QUALITY_r02.md)
    "raw_reconstruction_weight": 100.0,   # un-pre-emphasized MSE: restores
    # gradient at the f0 band that pre-emphasis removes (tools/diag_sisdr.py)
    "grad_clip_norm": 10.0,               # one unclipped run showed a 1e7x
    # log-mel gradient excursion (CONVERGE_r03.json f32_w10_raw0)
    "eval_every": 2,
    "save_every": 1000,  # effectively: save only at each train() chunk end
    # (trainer.train always saves at call end if steps advanced). Checkpoint
    # saves device_get the FULL train state through the axon tunnel
    # (~minutes each): at the default save_every=5 + 4-epoch chunks, saves
    # ate ~5x the step time of the GAN campaign.
}

CONFIGS = {
    "rvq8_hifi": {
        "use_discriminator": False,
        "vae_args": {"num_quantizers": 8},
        "trainer_args": dict(BASE_TRAINER),
        "train_run_args": {"gan_loss": False},
    },
    "rvq8_gan_hifi": {
        "use_discriminator": True,
        "vae_args": {"num_quantizers": 8},
        "trainer_args": dict(BASE_TRAINER, use_one_discriminator=True),
        "train_run_args": {},
    },
    "energy_hifi": {
        "use_discriminator": False,
        "vae_args": {"num_quantizers": 8, "bottleneck": "energy",
                     "energy_kwargs": {"n_iters": 8}},
        "trainer_args": dict(BASE_TRAINER),
        "train_run_args": {"gan_loss": False, "use_commit_loss": False},
    },
    # GAN FINE-TUNE of the trained rvq8_hifi checkpoint (the standard
    # GAN-codec recipe: converge reconstruction first, then add the
    # adversarial term). tools/gan_ft_r03.py seeds the step-0 transplant;
    # running this config from scratch without the seed is meaningless, so
    # main() skips it unless the seeded run dir exists.
    "rvq8_gan_ft": {
        "use_discriminator": True,
        "vae_args": {"num_quantizers": 8},
        "trainer_args": dict(BASE_TRAINER, use_one_discriminator=True),
        "train_run_args": {},
    },
    # PseudoSpeech campaign pair (round-4 plan): formant-structured
    # speech-like data gives the discriminator bank perceptual signal the
    # harmonic dataset lacks (QUALITY_r03.md finding 2's confound) — the
    # fair re-test of the reference's GAN claims. Run explicitly by name.
    "rvq8_speech": {
        "dataset": "synthetic_speech",
        "use_discriminator": False,
        "vae_args": {"num_quantizers": 8},
        "trainer_args": dict(BASE_TRAINER),
        "train_run_args": {"gan_loss": False},
    },
    "rvq8_gan_speech": {
        "dataset": "synthetic_speech",
        "use_discriminator": True,
        "vae_args": {"num_quantizers": 8},
        "trainer_args": dict(BASE_TRAINER, use_one_discriminator=True),
        "train_run_args": {},
    },
}

# configs that only make sense when requested explicitly (seeded fine-tune,
# the round-4 speech pair) — a bare `quality_r03.py` run skips them
EXPLICIT_ONLY = {"rvq8_gan_ft", "rvq8_speech", "rvq8_gan_speech"}

EPOCHS_PER_CHUNK = 10  # ~31 steps/epoch; aligned with save_every so each
# chunk ends exactly at a scheduled save (no extra end-of-train() save)


def eval_batch(n=16, seed=1234, dataset="synthetic"):
    from audio_generation_tpu.data.datasets import PseudoSpeech, SyntheticAudio

    cls = PseudoSpeech if dataset == "synthetic_speech" else SyntheticAudio
    ds = cls(length=CROP, sample_rate=SR, n_items=n, seed=seed)
    return np.stack([np.asarray(ds[i][0])[0] for i in range(len(ds))])


def run_config(name: str, hours: float, dtype: str):
    from audio_generation_tpu.config import ExperimentConfig
    from audio_generation_tpu.data import write_wav
    from audio_generation_tpu.evaluate import evaluate_codec
    from audio_generation_tpu.train.trainer import Trainer

    spec = json.loads(json.dumps(CONFIGS[name]))  # deep copy
    spec["vae_args"]["compute_dtype"] = dtype
    cfg = ExperimentConfig.from_dict(
        {
            "experiment_name": name,
            "dataset": "synthetic",
            "sample_rate": SR,
            "scratch_train": False,  # RESUME if checkpoints exist
            "save_path_root": os.path.join(OUT_DIR, "runs") + "/",
            **spec,
        }
    )
    trainer = Trainer(cfg)
    waves = eval_batch(dataset=cfg.dataset)
    if int(trainer.state.step) == 0:
        before = evaluate_codec(trainer.model, trainer._variables(), waves, SR)
        with open(os.path.join(OUT_DIR, f"{name}.before.json"), "w") as f:
            json.dump({k: round(v, 4) for k, v in before.items()}, f)

    deadline = time.time() + hours * 3600
    losses = []
    while time.time() < deadline:
        trainer.train(epochs=EPOCHS_PER_CHUNK, losses=losses)
        print(f"[{name}] step {int(trainer.state.step)} "
              f"({(deadline - time.time())/60:.0f} min left)", flush=True)

    after = evaluate_codec(trainer.model, trainer._variables(), waves, SR)
    before = json.load(open(os.path.join(OUT_DIR, f"{name}.before.json")))

    # artifacts: held-out reconstruction + unconditional sample
    y = trainer.reconstruct(waves[0])
    write_wav(os.path.join(OUT_DIR, f"{name}_recon.wav"), y, SR)
    write_wav(os.path.join(OUT_DIR, f"{name}_orig.wav"),
              waves[0][: len(y)], SR)
    if trainer.model.bottleneck == "rvq":
        import jax

        # jitted: an eager 225-frame decode dispatches per-op through the
        # axon tunnel (CLAUDE.md: always jit eval forwards)
        sample = jax.jit(
            lambda v, k: trainer.model.apply(
                v, k, 225, method="sample", mutable=["codebook"]
            )
        )(trainer._variables(), jax.random.key(0))[0]
        s = np.asarray(sample)
        if s.ndim == 3:  # (B, L, 1) for "b l c", (B, 1, L) for "n c l"
            s = s[0, :, 0] if trainer.model.input_format == "b l c" else s[0, 0, :]
        else:
            s = s[0]
        write_wav(os.path.join(OUT_DIR, f"{name}_uncond_sample.wav"),
                  s.astype(np.float32), SR)

    if trainer.model.bottleneck == "rvq":
        # codebook-usage artifact from the TRAINED checkpoint (VERDICT task 9;
        # reference demos this via animate_sound, networks/utils.py:261-296).
        # ffmpeg is absent in this image, so save the SOM-grid heatmap frames
        # as a PNG montage + the raw tensor.
        from audio_generation_tpu.utils.codebook_viz import sound_to_codebooks

        x0 = trainer.steps._model_input(
            np.asarray(waves[:1], dtype=np.float32)
        )
        grid = sound_to_codebooks(x0, trainer.model, trainer._variables())
        np.save(os.path.join(OUT_DIR, f"{name}_codebook_usage.npy"), grid)
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            n_show = min(12, grid.shape[0])
            fig, axes = plt.subplots(2, 6, figsize=(14, 5))
            for ai, ax in enumerate(axes.ravel()):
                fi = ai * max(grid.shape[0] // n_show, 1)
                ax.imshow(grid[min(fi, grid.shape[0] - 1)], cmap="viridis")
                ax.set_title(f"frame {fi}", fontsize=8)
                ax.axis("off")
            fig.suptitle(f"{name}: SOM-grid codebook usage (trained)")
            fig.savefig(os.path.join(OUT_DIR, f"{name}_codebook_usage.png"),
                        dpi=110, bbox_inches="tight")
            plt.close(fig)
        except Exception:
            pass

    result = {
        "config": name,
        "dtype": dtype,
        "steps": int(trainer.state.step),
        "hours": hours,
        "loss_last16": float(np.mean(losses[-16:])) if losses else None,
        "before": before,
        "after": {k: round(float(v), 4) for k, v in after.items()},
    }
    with open(os.path.join(OUT_DIR, f"{name}.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result), flush=True)
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hours-per-config", type=float, default=2.5)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--markdown", action="store_true")
    ap.add_argument("--force", action="store_true",
                    help="re-run a config even if its final artifact exists "
                    "(resumes from the run-dir checkpoint when present, so "
                    "this is how a finished run gets EXTENDED)")
    ap.add_argument("names", nargs="*", default=None)
    args = ap.parse_args()
    if args.markdown:
        write_markdown()
        return
    os.makedirs(OUT_DIR, exist_ok=True)
    names = args.names or list(CONFIGS)
    for name in names:
        out = os.path.join(OUT_DIR, f"{name}.json")
        if os.path.exists(out) and not args.force:
            print(f"skip {name} (final artifact exists)")
            continue
        if name in EXPLICIT_ONLY and not args.names:
            print(f"skip {name} (explicit-only config; pass its name)")
            continue
        if name == "rvq8_gan_ft" and not os.path.isdir(
            os.path.join(OUT_DIR, "runs", name)
        ):
            print(f"skip {name} (needs the tools/gan_ft_r03.py seed)")
            continue
        print(f"=== {name} ({args.hours_per_config} h) ===", flush=True)
        try:
            run_config(name, args.hours_per_config, args.dtype)
        except Exception as e:  # a crashed config must not kill the campaign
            import traceback

            traceback.print_exc()
            with open(os.path.join(OUT_DIR, f"{name}.error.txt"), "w") as f:
                f.write(traceback.format_exc())
            print(f"[{name}] FAILED: {str(e)[:200]}", flush=True)
    write_markdown()




def write_markdown():
    """QUALITY_r03.md: per-config results + trajectory excerpts + the two
    reference-claim verdicts (GAN-at-matched-wallclock, energy-vs-RVQ)."""
    import csv

    rows = []
    for name in CONFIGS:
        p = os.path.join(OUT_DIR, f"{name}.json")
        if os.path.exists(p):
            rows.append(json.load(open(p)))
    if not rows:
        print("no results yet")
        return

    by_name = {r["config"]: r for r in rows}

    def traj(name):
        """In-loop eval trajectory from metrics.csv — ONLY when the csv
        covers the run the final artifact describes. A freshly (re)started
        run's csv would otherwise shadow the committed full-run trajectory
        (and corrupt the matched-step anchors) while it is still early."""
        p = os.path.join(OUT_DIR, "runs", name, "metrics.csv")
        if not os.path.exists(p):
            return []
        out = []
        for r in csv.DictReader(open(p)):
            if r.get("eval_si_sdr_db"):
                out.append((int(r["step"]), float(r["eval_si_sdr_db"]),
                            float(r["eval_snr_db"]), float(r["eval_mel_l1"])))
        expect = by_name.get(name, {}).get("steps")
        if out and expect and out[-1][0] < 0.8 * expect:
            return []
        return out

    def traj_line(name):
        """Pre-rendered trajectory line: from metrics.csv when the run dir
        exists, else carried over from the committed QUALITY_r03.md (run dirs
        are gitignored and do not survive VM resets)."""
        t = traj(name)
        if t:
            pts = t[:: max(len(t) // 12, 1)] + [t[-1]]
            return f"**{name}**: " + "  ".join(
                f"s{s}: {si:+.1f}dB/{mel:.2f}" for s, si, _snr, mel in pts
            ) + "  (step: SI-SDR/mel-L1)"
        for src in (os.path.join(OUT_DIR, "trajectories.bak.md"), "QUALITY_r03.md"):
            if os.path.exists(src):
                for line in open(src):
                    if line.startswith(f"**{name}**:"):
                        return line.rstrip("\n")
        return None

    lines = [
        "# QUALITY_r03 — flagship training campaign (VERDICT.md r2 task 1)",
        "",
        f"Wall-clock-budgeted bf16 runs on the synthetic dataset (TPU v5e, crop "
        f"{CROP} @ {SR} Hz, batch 8, reconstruction_loss_weight=100 [the "
        "reference config value] + raw_reconstruction_weight=100 [framework "
        "extension; see tools/diag_sisdr.py], grad clip 10). Evaluated on a "
        "held-out synthetic batch (seed 1234); in-loop trajectories in "
        f"`{OUT_DIR}/runs/<name>/metrics.csv`. Wav + codebook-usage artifacts "
        f"per config under `{OUT_DIR}/`.",
        "",
        "| config | steps | SNR dB (init→) | SI-SDR dB (init→) | mel-L1 (init→) | kbps |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        b, a = r["before"], r["after"]
        lines.append(
            f"| {r['config']} | {r['steps']} | "
            f"{b['snr_db']:.2f}→{a['snr_db']:.2f} | "
            f"{b['si_sdr_db']:.2f}→{a['si_sdr_db']:.2f} | "
            f"{b['mel_l1']:.3f}→{a['mel_l1']:.3f} | "
            f"{a['bitrate_bps']/1000:.1f} |"
        )
    lines.append("")
    lines.append("## SI-SDR / mel trajectories (held-out, in-loop eval)")
    lines.append("")
    for r in rows:
        tl = traj_line(r["config"])
        if tl is None:
            continue
        lines.append(tl)
        lines.append("")
    by = {r["config"]: r for r in rows}
    lines += ["## Findings", ""]
    if "rvq8_hifi" in by:
        a = by["rvq8_hifi"]["after"]
        lines += [
            f"1. **The codec now demonstrably works** (VERDICT r2 task 1): "
            f"`rvq8_hifi` reaches **SI-SDR {a['si_sdr_db']:+.2f} dB / SNR "
            f"{a['snr_db']:+.2f} dB / mel-L1 {a['mel_l1']:.2f}** at 4 kbps "
            f"after {by['rvq8_hifi']['steps']} steps "
            f"(~{by['rvq8_hifi'].get('hours', 2.2):.1f} h on one v5e) — vs "
            "the round-2 plateau of SI-SDR -30 dB. The unlock was loss "
            "weighting, not scale: pre-emphasis (0.97) removes 19 dB of the "
            "synthetic data's power (85% of energy < 500 Hz) before the only "
            "phase-sensitive loss, so round 2's codecs matched spectra but "
            "never low-frequency phase (tools/diag_sisdr.py). With the "
            "reference's reconstruction_loss_weight=100 + a raw "
            "(un-pre-emphasized) MSE term, SI-SDR rises monotonically "
            "(-42 dB -> +5 dB in-loop; no plateau yet at budget end).",
            "",
        ]
    if "rvq8_gan_hifi" in by and "rvq8_hifi" in by:
        g = by["rvq8_gan_hifi"]
        # no-GAN in-loop SI-SDR anchors (step -> dB) from the rvq8_hifi run
        # (QUALITY_r03/runs metrics.csv; survives in the committed md). The
        # in-loop eval reads ~1.2 dB below the final evaluate_codec number at
        # the same step (different batch layout), noted below.
        nogan_anchor = [(s, si) for s, si, _snr, _mel in traj("rvq8_hifi")] or [
            # fallback: in-loop anchors from the first r03 rvq8_hifi run
            # (its run dir did not survive the VM reset)
            (1705, -3.8), (3379, -0.3), (5053, 1.9), (6727, 1.8),
            (8401, 4.2), (10075, 4.0), (11749, 4.1), (13423, 4.8),
            (15097, 5.1), (16771, 5.1), (18445, 5.7), (20119, 6.1),
        ]
        gs = g["steps"]
        astep, adb = min(nogan_anchor, key=lambda p: abs(p[0] - gs))
        gdb = g["after"]["si_sdr_db"]
        gap = gdb - adb
        verdict = (
            "BEATS the no-GAN run at matched steps"
            if gap > 1.0
            else (
                "matched-step parity — the one-sampled-discriminator GAN "
                "trains stably WITHOUT harming reconstruction, as the "
                "reference claims"
                if gap > -1.5
                else "still lags the no-GAN run at matched steps"
            )
        )
        lines += [
            f"2. **GAN vs no-GAN** (reference README.md:58 regime): the "
            f"adversarial flagship ran {gs} steps and finishes at SI-SDR "
            f"{gdb:+.2f} dB / mel-L1 {g['after']['mel_l1']:.2f}; the no-GAN "
            f"rvq8_hifi in-loop trajectory reads {adb:+.1f} dB at the nearest "
            f"matched step ({astep}; in-loop eval reads ~1.2 dB below the "
            f"final evaluate_codec batch at the same step). Verdict at this "
            f"horizon: {verdict}. At matched wall-clock the no-GAN run "
            "remains ahead because GAN steps cost ~3x more (discriminator "
            "forwards + updates) plus one compile per sampled discriminator. "
            "On synthetic harmonic data the discriminator's perceptual "
            "advantage has little to bite on; the strong evidence is "
            f"stability + non-harm of adversarial training at a {gs / 3968:.1f}x "
            "longer horizon than round 3's first GAN run (3,968 steps, kept "
            "in rvq8_gan_hifi.step3968.json).",
            "",
        ]
    if "rvq8_gan_ft" in by:
        r = by["rvq8_gan_ft"]
        b, a = r["before"], r["after"]
        dsi = a["si_sdr_db"] - b["si_sdr_db"]
        dmel = a["mel_l1"] - b["mel_l1"]
        ft_verdict = (
            "IMPROVES the converged codec"
            if dsi > 0.5 and dmel < 0.05
            else (
                "holds quality — adding the one-sampled discriminator to a "
                "converged codec does NOT harm reconstruction, the "
                "defensible form of the reference's README.md:58 claim"
                if dsi > -1.5
                else "degrades the converged codec even in the fine-tune "
                "regime"
            )
        )
        lines += [
            f"2b. **GAN fine-tune of the converged codec** "
            f"(tools/gan_ft_r03.py): seeding a fresh adversarial run with "
            f"the trained rvq8_hifi generator (step "
            f"{r.get('donor_step_at_seed', '?')}) and fine-tuning "
            f"{r['steps']} steps with the one-sampled discriminator moves "
            f"SI-SDR {b['si_sdr_db']:+.2f} -> {a['si_sdr_db']:+.2f} dB "
            f"({dsi:+.2f}) and mel-L1 {b['mel_l1']:.3f} -> "
            f"{a['mel_l1']:.3f} ({dmel:+.3f}). Verdict: {ft_verdict}. "
            "(The from-scratch GAN comparison is finding 2; the standard "
            "GAN-codec recipe is exactly this converge-then-adversarial "
            "schedule.)",
            "",
        ]
    if "energy_hifi" in by and "rvq8_hifi" in by:
        e = by["energy_hifi"]
        lines += [
            f"3. **Energy-transformer bottleneck vs RVQ** (reference "
            f"README.md:56 \"much stronger than RVQ\"): a SPLIT verdict at "
            f"this 20x-longer horizon. Per optimizer step the energy "
            f"bottleneck now LEADS — SI-SDR {e['after']['si_sdr_db']:+.1f} dB "
            f"at {e['steps']} steps vs RVQ-8's +1.8 dB at ~6.7k steps "
            "(in-loop trajectory) — reversing the round-2 toy-scale result "
            "and giving the reference's claim its first supporting evidence "
            "in this repo. Per unit COMPUTE, RVQ-8 still wins: the 8-iteration "
            "energy descent makes each step ~1.5x slower, and at matched "
            f"wall-clock (~1.6 h) RVQ-8 sits ~+4 dB vs energy's "
            f"{e['after']['si_sdr_db']:+.1f}, finishing at "
            f"{by['rvq8_hifi']['after']['si_sdr_db']:+.1f} dB with its full "
            "budget. Note the energy run also dropped the commit loss "
            "(reference regime) and reports NO usable bitrate: its bottleneck "
            "is continuous (indices are a placeholder), so it is not a codec "
            "in the coded-transmission sense.",
            "",
        ]
    lines += [
        "4. bf16 compute: ~2-3x faster no-GAN steps than f32 at a small "
        "per-step convergence penalty that does NOT close by 620 steps "
        "(CONVERGE_r03.json) — at matched wall-clock bf16 still wins, which "
        "is why the campaign ran bf16. Reference-scale GAN step in bf16: "
        "19.96 s/step (19.2x training realtime) WITHOUT remat — bf16's "
        "halved activations make rematerialization unnecessary at the "
        "reference's batch 4 x accum 32 x 72000 config (REFSCALE_r03.json; "
        "f32 needed remat and ran 23.65 s).",
        "",
        "5. One f32 run at round-2 weights diverged (loss 3.4 -> 1.6e7, "
        "partial recovery) from a log-mel eps-gradient spike; the campaign "
        "runs use the new grad_clip_norm=10 and stayed finite throughout.",
    ]
    with open("QUALITY_r03.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote QUALITY_r03.md ({len(rows)} configs)")

if __name__ == "__main__":
    main()
