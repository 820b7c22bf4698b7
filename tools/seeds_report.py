"""Seed-replication table for the GAN-vs-matched-control claim.

VERDICT r4 task 4: the headline result (a tuned single-adversary GAN
fine-tune beats its matched no-GAN control, QUALITY_r04.md) rested on one
run per arm. This aggregates every PAIRED (GAN fm50, no-GAN control) run of
the same donor + duration + seed from QUALITY_r04/sweep into SEEDS_r05.json:
per-pair metric deltas, per-metric win counts, and mean +/- range across
pairs. Pairs:
  seed 0, 20 min  : fm50            vs nogan            (round-4 sweep)
  seed 0, 90 min  : fm50_long90     vs nogan_long90     (round-4 long)
  seed 1, 30 min  : fm50_s1m30      vs nogan_s1m30      (this round)
  seed 2, 30 min  : fm50_s2m30      vs nogan_s2m30      (this round)
Adjudicates /root/reference/README.md:57-58 (the one-discriminator
adversarial claim) with n>=3 independent seeds/durations.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import quality_r04 as q

SWEEP_DIR = os.path.join(q.OUT_DIR, "sweep")

# (pair_name, gan_tag, control_tag)
PAIRS = [
    ("seed0_20min", "fm50", "nogan"),
    ("seed0_90min", "fm50_long90", "nogan_long90"),
    ("seed1_30min", "fm50_s1m30", "nogan_s1m30"),
    ("seed2_30min", "fm50_s2m30", "nogan_s2m30"),
]

# metric -> +1 if higher is better, -1 if lower is better
METRICS = {"si_sdr_db": 1, "mel_l1": -1, "mcd_db": -1, "stoi_proxy": 1}


def _load(tag):
    p = os.path.join(SWEEP_DIR, f"{tag}.json")
    return json.load(open(p)) if os.path.exists(p) else None


def main():
    pairs_out, deltas = [], {m: [] for m in METRICS}
    for name, g_tag, c_tag in PAIRS:
        g, c = _load(g_tag), _load(c_tag)
        if g is None or c is None:
            print(f"pair {name}: missing ({g_tag}={bool(g)} {c_tag}={bool(c)})")
            continue
        row = {
            "pair": name,
            "gan": g_tag,
            "control": c_tag,
            "gan_minutes": round(g["train_minutes"], 1),
            "control_minutes": round(c["train_minutes"], 1),
            "gan_after": g["after"],
            "control_after": c["after"],
        }
        wins = 0
        for m, sign in METRICS.items():
            d = g["after"][m] - c["after"][m]
            row[f"delta_{m}"] = round(d, 4)
            row[f"gan_wins_{m}"] = bool(sign * d > 0)
            wins += int(sign * d > 0)
            deltas[m].append(d)
        row["gan_wins_n_of_4"] = wins
        pairs_out.append(row)

    summary = {}
    for m, sign in METRICS.items():
        a = np.asarray(deltas[m], dtype=np.float64)
        if a.size == 0:
            continue
        summary[m] = {
            "mean_delta": round(float(a.mean()), 4),
            "min_delta": round(float(a.min()), 4),
            "max_delta": round(float(a.max()), 4),
            "gan_wins": int(np.sum(sign * a > 0)),
            "n_pairs": int(a.size),
            "higher_is_better": sign > 0,
        }

    out = {
        "claim": "tuned single-STFT-adversary GAN fine-tune beats its "
                 "matched no-GAN control (same donor rvq8_speech, same "
                 "duration, same data) — reference README.md:57-58",
        "protocol": "paired arms share donor/duration/seed; seeds vary the "
                    "shuffle order, crop positions and adversary init; "
                    "held-out PseudoSpeech eval batch (seed 1234) fixed "
                    "across all arms",
        "pairs": pairs_out,
        "summary": summary,
    }
    with open("SEEDS_r05.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote SEEDS_r05.json ({len(pairs_out)} pairs)")
    for m, s in summary.items():
        print(f"  {m}: GAN wins {s['gan_wins']}/{s['n_pairs']}  "
              f"mean delta {s['mean_delta']:+.3f} "
              f"[{s['min_delta']:+.3f}, {s['max_delta']:+.3f}]")


if __name__ == "__main__":
    main()
