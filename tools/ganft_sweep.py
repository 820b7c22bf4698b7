"""Adversarial-balance sweep: short GAN fine-tunes of the trained speech
flagship across feature_multiplier settings (VERDICT r3 task 3: "sweep
discriminator_lr and feature_multiplier ... Done = GAN >= no-GAN on at least
one perceptual metric at matched wall-clock, or a committed artifact showing
the tuned refutation").

Design
------
- Donor: the committed `artifacts/ckpt/rvq8_speech.npz` flagship snapshot
  (39k no-GAN steps on PseudoSpeech) — every variant starts from the SAME
  converged generator, so after-minus-donor deltas isolate the adversarial
  term (converge-then-adversarial, as the reference's own training history
  suggests: its checkpoints resume into GAN training,
  networks/training.py:214-240).
- Adversary: a SINGLE full-size STFT discriminator (win 1024). One
  discriminator <=> one step_fn compile per variant (the sampled-bank
  setup would recompile up to 6 big graphs per sweep point, CLAUDE.md
  compile budget); single-resolution-STFT adversaries are a standard codec
  setup (EnCodec-style). The full-bank points live in QUALITY_r04
  (rvq8_gan_ft_speech fm=2, rvq8_gan_speech fm=10).
- Swept axis: feature_multiplier in {0, 2, 10, 50} at equal G/D LR 2e-4.
  fm=0 is pure hinge adversarial (tests whether feature matching is the
  destabilizer); fm=50 approaches the reference's hardcoded 100
  (networks/training.py:83-88) that destabilized round 3.
- Each variant trains ~SWEEP_MINUTES on the TPU, then evals the same
  held-out PseudoSpeech batch as QUALITY_r04 (seed 1234) so rows are
  directly comparable with the campaign tables.

Run one variant per process (`run <tag>`): an external `timeout` then
bounds a wedged remote compile (in-process deadlines cannot fire while an
RPC is blocked — CLAUDE.md wedge protocol). `report` aggregates to
GANFT_SWEEP_r04.json; `tools/quality_r04.py --markdown` renders the table.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import quality_r04 as q

SWEEP_DIR = os.path.join(q.OUT_DIR, "sweep")
CORPUS_NPY = "/tmp/ps_corpus_4096.npy"  # presynth cache (VM-reset volatile;
# variants fall back to live synthesis when it is missing)
SWEEP_MINUTES = 20.0

VARIANTS = {  # tag -> feature_multiplier (G/D LR fixed at 2e-4)
    "fm0": 0.0,
    "fm2": 2.0,
    "fm10": 10.0,
    "fm50": 50.0,
    # control: continued NO-GAN training of the same donor at the same LR
    # for the same minutes. Without it, "fine-tune improved mel/MCD/STOI*"
    # cannot be attributed to the adversary vs. plain extra training.
    "nogan": None,
}


class DiskPS:
    """PseudoSpeech items memmapped from a presynthesized .npy — byte-equal
    to live synthesis (same (seed, index) determinism), minus the ~10 min
    per-process synthesis cost on this 1-core VM."""

    def __init__(self, path: str):
        self._arr = np.load(path, mmap_mode="r")

    def __len__(self):
        return self._arr.shape[0]

    def __getitem__(self, n: int):
        return np.asarray(self._arr[n], dtype=np.float32), q.SR, {"i": str(n)}


def presynth():
    if os.path.exists(CORPUS_NPY):
        print(f"presynth: {CORPUS_NPY} exists")
        return
    ds = q.build_dataset()
    t0 = time.time()
    out = np.lib.format.open_memmap(
        CORPUS_NPY + ".tmp.npy", mode="w+", dtype=np.float32,
        shape=(len(ds), 1, ds.length),
    )
    for i in range(len(ds)):
        out[i] = ds[i][0]
        if i % 512 == 0:
            print(f"presynth {i}/{len(ds)} ({time.time()-t0:.0f}s)", flush=True)
    out.flush()
    del out
    os.rename(CORPUS_NPY + ".tmp.npy", CORPUS_NPY)
    print(f"presynth done: {CORPUS_NPY} ({time.time()-t0:.0f}s)")


def _dataset():
    if os.path.exists(CORPUS_NPY):
        ds = DiskPS(CORPUS_NPY)
        if len(ds) == q.N_ITEMS:
            return ds
        print(f"presynth corpus has {len(ds)} items != {q.N_ITEMS}; resynth")
    return q.build_dataset()


def make_sweep_trainer(tag: str, smoke=False, seed: int = 0):
    from audio_generation_tpu.config import ExperimentConfig
    from audio_generation_tpu.models.discriminators import STFTDiscriminator
    from audio_generation_tpu.train.trainer import Trainer

    fm = VARIANTS[tag]
    spec = json.loads(json.dumps(q.CONFIGS["rvq8_gan_ft_speech"]))
    spec["vae_args"]["compute_dtype"] = "float32" if smoke else "bfloat16"
    if fm is None:  # no-GAN control: same donor/LR/minutes, adversary OFF
        spec["use_discriminator"] = False
        spec["trainer_args"]["feature_multiplier"] = 0.0
    else:
        spec["trainer_args"]["feature_multiplier"] = fm
    spec["trainer_args"]["save_every"] = 10**6  # tunnel saves cost minutes;
    # a 20-min probe never needs a mid-run checkpoint
    spec["trainer_args"]["seed"] = seed  # varies shuffle order, crop
    # positions, adversary init and discriminator sampling — the generator
    # itself comes from the donor snapshot, identical across seeds
    if smoke:  # mirror quality_r04.make_trainer's CPU-smoke geometry so the
        # donor smoke snapshot (/tmp/r04_smoke) transplants cleanly
        spec["vae_args"]["first_block_channels"] = 8
        spec["trainer_args"].update(batch_size=2, mini_epoch_length=4,
                                    crop_size=6144, data_workers=2)
    root = "/tmp/ganft_sweep_smoke/" if smoke else "/tmp/ganft_sweep/"
    cfg = ExperimentConfig.from_dict(
        {
            "experiment_name": f"ganft_{tag}" + (f"_s{seed}" if seed else ""),
            "dataset": q.DATASET,
            "sample_rate": q.SR,
            "scratch_train": True,  # /tmp run dirs; donor seeds every start
            "save_path_root": root,
            **spec,
        }
    )
    discs = None
    if fm is not None:
        discs = (
            [STFTDiscriminator(win_length=1024,
                               first_channel_size=4 if smoke else 32)],
            ["stft_discriminator_1024"],
        )
    return Trainer(cfg, dataset=q.build_dataset(True) if smoke else _dataset(),
                   data_sample_rate=q.SR, discriminators=discs)


def run(tag: str, minutes: float = SWEEP_MINUTES, smoke=False,
        out_tag: str | None = None, save_snapshot: bool = False,
        donor: str | None = None, seed: int = 0):
    from audio_generation_tpu.evaluate import evaluate_codec

    out_tag = out_tag or tag
    scratch = donor == "scratch"  # from-scratch arm: tuned adversarial
    # recipe applied without a converged donor (VERDICT r4 task 5)
    donor = donor or q.GANFT_DONOR
    sweep_dir = "/tmp/ganft_sweep_smoke/out" if smoke else SWEEP_DIR
    os.makedirs(sweep_dir, exist_ok=True)
    out_p = os.path.join(sweep_dir, f"{out_tag}.json")
    if os.path.exists(out_p):
        print(f"[{out_tag}] exists — skipping")
        return

    trainer = make_sweep_trainer(tag, smoke, seed=seed)
    if scratch:
        donor_step = 0
    else:
        donor_step = q.restore_trainer_from_snapshot(trainer, donor, smoke)
        if donor_step == 0:
            sys.exit(f"no donor snapshot {donor}")
    waves = q.eval_batch(smoke=smoke)

    deadline = time.time() + minutes * 60
    losses: list = []
    t0 = time.time()
    while time.time() < deadline:
        # deadline also passed down: train() stops at mini-epoch granularity
        # so budgeted arms stay wall-clock MATCHED (round-4's wavelet A/B
        # overshot one arm by a full 20-min epoch without this)
        trainer.train(epochs=1, losses=losses, deadline=deadline)
        print(f"[{tag}] step {int(trainer.state.step)} "
              f"({(deadline - time.time())/60:.0f} min left)", flush=True)

    after = evaluate_codec(trainer.model, trainer._variables(), waves, q.SR)
    result = {
        "tag": out_tag,
        "feature_multiplier": VARIANTS[tag],
        "lr": {"model": 2e-4, "discriminator": 2e-4},
        "adversary": ("none (no-GAN control)" if VARIANTS[tag] is None
                      else "stft_discriminator_1024 (single, full-size)"),
        "donor": "scratch" if scratch else donor,
        "seed": seed,
        "donor_step": donor_step,
        "steps": int(trainer.state.step),
        "train_minutes": (time.time() - t0) / 60.0,
        "loss_last16": float(np.mean(losses[-16:])) if losses else None,
        "after": {k: round(float(v), 4) for k, v in after.items()},
    }
    if save_snapshot and not smoke:
        import jax

        from audio_generation_tpu.train.checkpoint import save_params_npz

        snap_p = os.path.join(q.SNAP_DIR, f"ganft_{out_tag}.npz")
        size = save_params_npz(
            snap_p,
            jax.device_get(trainer.state.params),
            jax.device_get(trainer.state.codebook),
            {"config": f"ganft_{out_tag}", "step": int(trainer.state.step),
             "dtype": str(trainer.model.compute_dtype),
             "vae_args": q.CONFIGS["rvq8_gan_ft_speech"]["vae_args"],
             "sample_rate": q.SR},
            params_dtype="float16",
        )
        result["snapshot"] = snap_p
        print(f"[{out_tag}] snapshot -> {snap_p} ({size/1e6:.1f} MB)")
    with open(out_p, "w") as f:
        json.dump(result, f, indent=1)
    csv_src = os.path.join(trainer.workdir, "metrics.csv")
    if os.path.exists(csv_src):
        import shutil

        shutil.copy(csv_src, os.path.join(sweep_dir, f"{out_tag}.metrics.csv"))
    print(json.dumps(result), flush=True)


def best() -> str:
    """Sweep winner by held-out STOI* (the perceptual metric the adversarial
    claim is about), mel-L1 as tie-break. Prints the tag for shell use."""
    rows = []
    for tag, fm in VARIANTS.items():
        if fm is None:  # the no-GAN control is not a GAN candidate
            continue
        p = os.path.join(SWEEP_DIR, f"{tag}.json")
        if os.path.exists(p):
            rows.append(json.load(open(p)))
    if not rows:
        sys.exit("no sweep results yet")
    win = max(rows, key=lambda r: (round(r["after"]["stoi_proxy"], 4),
                                   -r["after"]["mel_l1"]))
    print(win["tag"])
    return win["tag"]


def report():
    donor_p = os.path.join(q.OUT_DIR, f"{q.GANFT_DONOR}.json")
    donor = json.load(open(donor_p))["after"] if os.path.exists(donor_p) else None
    tags = list(VARIANTS)
    if os.path.isdir(SWEEP_DIR):  # extras, e.g. the best-variant long run
        tags += sorted(f[:-5] for f in os.listdir(SWEEP_DIR)
                       if f.endswith(".json") and f[:-5] not in VARIANTS)
    rows = []
    for tag in tags:
        p = os.path.join(SWEEP_DIR, f"{tag}.json")
        if os.path.exists(p):
            rows.append(json.load(open(p)))
    out = {"donor_after": donor, "minutes_per_variant": SWEEP_MINUTES,
           "variants": rows}
    with open("GANFT_SWEEP_r04.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote GANFT_SWEEP_r04.json ({len(rows)} variants)")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "report"
    if cmd == "presynth":
        presynth()
    elif cmd == "run":
        run(sys.argv[2], float(sys.argv[3]) if len(sys.argv) > 3 else SWEEP_MINUTES)
    elif cmd == "long":  # budgeted fine-tune of one variant (usually `best`),
        # written as an extra sweep row + a committed npz snapshot
        tag = sys.argv[2]
        minutes = float(sys.argv[3]) if len(sys.argv) > 3 else 90.0
        run(tag, minutes, out_tag=f"{tag}_long{int(minutes)}",
            save_snapshot=True)
    elif cmd == "extend":  # continue a saved long-run snapshot: the npz
        # stores params+codebook only, so the optimizer/adversary restart
        # fresh (same converge-then-adversarial mechanics as the original
        # fine-tune). Adds another matched point to the GAN-vs-control
        # wall-clock curves.
        #   extend <variant_tag> <snapshot_name> [minutes=90] [out_tag]
        tag = sys.argv[2]
        snap = sys.argv[3]
        minutes = float(sys.argv[4]) if len(sys.argv) > 4 else 90.0
        out_tag = (sys.argv[5] if len(sys.argv) > 5
                   else f"{tag}_ext{int(minutes)}")
        run(tag, minutes, out_tag=out_tag, save_snapshot=True, donor=snap)
    elif cmd == "seedrun":  # seed replication of the GAN-vs-control claim
        # (VERDICT r4 task 4): same donor, same duration, new trainer seed
        # (shuffle/crops/adversary-init).  seedrun <tag> <seed> [minutes=35]
        tag = sys.argv[2]
        seed = int(sys.argv[3])
        minutes = float(sys.argv[4]) if len(sys.argv) > 4 else 35.0
        run(tag, minutes, out_tag=f"{tag}_s{seed}m{int(minutes)}", seed=seed)
    elif cmd == "scratchrun":  # tuned recipe FROM SCRATCH at a budget
        # (VERDICT r4 task 5): scratchrun <tag> <minutes> [out_tag]
        tag = sys.argv[2]
        minutes = float(sys.argv[3])
        out_tag = (sys.argv[4] if len(sys.argv) > 4
                   else f"scratch_{tag}_m{int(minutes)}")
        run(tag, minutes, out_tag=out_tag, donor="scratch")
    elif cmd == "best":
        best()
    elif cmd == "smoke":  # CPU pipeline check (needs /tmp/r04_smoke donor:
        # run `python tools/quality_r04.py --smoke rvq8_speech` first)
        run("fm2", 0.02, smoke=True)
        run("nogan", 0.02, smoke=True)
        print("sweep smoke OK")
    elif cmd == "report":
        report()
    else:
        sys.exit(f"unknown command {cmd}")
