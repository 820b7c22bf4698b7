"""Batch-size / clip-length sweep of the flagship encode+decode throughput.

bench.py's headline config (bf16, batch 32 x 3 s) was chosen in round 1;
this records whether a bigger batch (better dispatch amortization + lane
packing at the low-channel stages) or longer clips move the headline.
Writes SWEEP_r03.json. Serial TPU use only (CLAUDE.md wedge protocol).

Usage: python tools/bench_sweep.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp

    from bench import measure

    sr = 24000
    out = []
    for batch, secs, iters in [
        (16, 3, 8),
        (32, 3, 10),
        (64, 3, 8),
        (128, 3, 6),
        (32, 6, 8),
        (64, 6, 6),
    ]:
        try:
            p50, p50_single = measure(jnp.bfloat16, batch, sr * secs, iters)
        except Exception as e:  # OOM at the big end is a result, not a crash
            out.append({"batch": batch, "secs": secs, "error": str(e)[:200]})
            print(f"b{batch} x {secs}s: FAILED {str(e)[:120]}", flush=True)
            continue
        rtf = batch * secs / p50
        out.append(
            {
                "batch": batch,
                "secs": secs,
                "p50_device_ms": round(p50 * 1e3, 2),
                "p50_single_dispatch_ms": round(p50_single * 1e3, 2),
                "audio_s_per_s": round(rtf, 1),
            }
        )
        print(f"b{batch} x {secs}s: {p50*1e3:.1f} ms -> {rtf:.0f} audio-s/s",
              flush=True)

    best = max((r for r in out if "audio_s_per_s" in r),
               key=lambda r: r["audio_s_per_s"])
    res = {"dtype": "bfloat16", "sweep": out, "best": best}
    with open("SWEEP_r03.json", "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
