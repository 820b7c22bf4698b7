#!/bin/bash
# Round-4 RESUME queue (after the 2026-08-20 VM reset wiped /tmp and killed
# queue2 mid-flight). Replays every phase of queues 2-4 that had not yet
# committed its artifacts:
#   queue2 phases 3-6: energy flagship GAN fine-tune 45 min + no-GAN control
#     45 min, om.wav demo through the energy flagship, bench_energy,
#     report/markdown/commit.  (Phases 1-2, the rvq8 no-GAN controls, landed
#     in commit 4778aaf before the reset.)
#   queue4 phases 1-2: +90 min extensions of both long GAN-vs-control
#     branches from their committed npz snapshots.
#   queue3: wavelet-vs-upsample A/B, 40 min per arm.
#   queue4 phase 3 (conditional): energy GAN-ft +90 min if the 45-min run
#     beat its control on >=2 of {mel, MCD, STOI*}.
# Ordering puts the matched GAN/control pairs first (they are the round's
# headline science); the wavelet A/B runs before the conditional extension
# so a wall-clock cut drops the lowest-value phase.
# Serial TPU; each phase timeout-bounded (CLAUDE.md wedge protocol).
set -x
cd "$(dirname "$0")/.."
echo $$ > /tmp/r04_resume.pid

run_phase() {  # run_phase <timeout_s> <log> <cmd...>
    local T="$1" LOG="$2"; shift 2
    timeout "$T" "$@" > "$LOG" 2>&1 &
    echo $! > /tmp/gan_run.pid
    ln -sf "$LOG" /tmp/gan_run.log
    wait $!
    echo "phase '$3 $4 $5' exited $? at $(date)"
}

commit_artifacts() {
    git add -A QUALITY_r04 QUALITY_r04.md GANFT_SWEEP_r04.json \
        WAVELET_AB_r04.json ENERGY_BENCH_r04.json artifacts 2>/dev/null
    git diff --cached --quiet || git commit -q -m "$1"
}

# compile-helper probe with retries (tunnel cold start after a VM boot can
# exceed 300 s; two failed attempts before a pass is normal)
probe_ok=""
for attempt in 1 2 3 4; do
    run_phase 300 /tmp/r04_res_probe.log python -u -c "
import jax, jax.numpy as jnp
print(jax.jit(lambda x: (x @ x).sum())(jnp.ones((256, 256))))"
    if grep -q "16777216" /tmp/r04_res_probe.log; then probe_ok=1; break; fi
    echo "probe attempt $attempt failed; retrying in 120s"
    sleep 120
done
[ -n "$probe_ok" ] || { echo "compile-helper probe FAILED 4x; aborting"; exit 1; }

# --- queue2 phases 3+4: energy flagship GAN-ft vs matched no-GAN control ---
if [ ! -f QUALITY_r04/sweep/energy_fm50.json ] && \
   ! ls QUALITY_r04/sweep/energy_fm*.json >/dev/null 2>&1; then
    run_phase 7200 /tmp/r04_q2_energy_fm.log \
        python -u tools/energy_ganft.py run 45
fi
if [ ! -f QUALITY_r04/sweep/energy_nogan.json ]; then
    run_phase 7200 /tmp/r04_q2_energy_nogan.log \
        python -u tools/energy_ganft.py run 45 nogan
fi
commit_artifacts "GANFT_SWEEP_r04: energy-flagship GAN fine-tune vs no-GAN control"

# --- queue2 phase 5: om.wav demo through the energy flagship ---
[ -f QUALITY_r04/om_demo_energy_rvq_speech.json ] || \
    run_phase 1800 /tmp/r04_q2_om.log \
        python -u tools/om_demo.py energy_rvq_speech

# --- queue2 phase 5b: serving cost of the energy-descent bottleneck ---
[ -f ENERGY_BENCH_r04.json ] || \
    run_phase 3600 /tmp/r04_q2_bench_energy.log \
        python -u tools/bench_energy.py
commit_artifacts "ENERGY_BENCH_r04 + om energy demo: energy-codec serving cost and real-audio round-trip"

timeout 600 python tools/ganft_sweep.py report > /tmp/r04_res_report1.log 2>&1
timeout 600 python tools/quality_r04.py --markdown >> /tmp/r04_res_report1.log 2>&1
commit_artifacts "QUALITY_r04: GAN-vs-control verdict rows (rvq8 + energy donors)"

# --- queue4 phases 1+2: +90 min extensions of the long GAN/control pair ---
[ -f QUALITY_r04/sweep/fm50_ext90.json ] || \
    run_phase 7200 /tmp/r04_q4_fm50ext.log \
        python -u tools/ganft_sweep.py extend fm50 ganft_fm50_long90 90
timeout 600 python tools/ganft_sweep.py report >> /tmp/r04_q4_fm50ext.log 2>&1
commit_artifacts "GANFT_SWEEP_r04: GAN branch +90 min (fm50_ext90) from the long-run snapshot"

[ -f QUALITY_r04/sweep/nogan_ext90.json ] || \
    run_phase 7200 /tmp/r04_q4_noganext.log \
        python -u tools/ganft_sweep.py extend nogan ganft_nogan_long90 90
timeout 600 python tools/ganft_sweep.py report >> /tmp/r04_q4_noganext.log 2>&1
commit_artifacts "GANFT_SWEEP_r04: no-GAN control branch +90 min (nogan_ext90)"

# --- queue3: wavelet-vs-upsample decoder A/B (matched wall-clock) ---
[ -f QUALITY_r04/wavelet_ab/wav.json ] || \
    run_phase 4800 /tmp/r04_q3_wav.log python -u tools/wavelet_ab.py run wav 40
[ -f QUALITY_r04/wavelet_ab/ups.json ] || \
    run_phase 6000 /tmp/r04_q3_ups.log python -u tools/wavelet_ab.py run ups 40
timeout 600 python tools/wavelet_ab.py report > /tmp/r04_q3_report.log 2>&1
commit_artifacts "WAVELET_AB_r04: wavelet vs learned-upsample decoder head-to-head (matched wall-clock)"

# --- queue4 phase 3 (conditional): extend the energy GAN-ft if it won ---
if python - <<'EOF'
import glob, json, os, sys
fms = [p for p in glob.glob("QUALITY_r04/sweep/energy_fm*.json")
       if "_ext" not in p]
ng_p = "QUALITY_r04/sweep/energy_nogan.json"
if not fms or not os.path.exists(ng_p):
    sys.exit(1)
fm = json.load(open(fms[0]))["after"]
ng = json.load(open(ng_p))["after"]
wins = (fm["mel_l1"] < ng["mel_l1"]) + (fm["mcd_db"] < ng["mcd_db"]) \
     + (fm["stoi_proxy"] > ng["stoi_proxy"])
print(f"energy GAN wins {wins}/3 vs control")
sys.exit(0 if wins >= 2 else 1)
EOF
then
    run_phase 7200 /tmp/r04_q4_energyext.log \
        python -u tools/energy_ganft.py extend ganft_energy_fm50 90
else
    echo "energy GAN did not beat its control — skipping the extension"
fi

# --- final aggregate + render + commit ---
timeout 600 python tools/ganft_sweep.py report > /tmp/r04_res_report2.log 2>&1
timeout 600 python tools/quality_r04.py --markdown >> /tmp/r04_res_report2.log 2>&1
commit_artifacts "QUALITY_r04: final round-4 verdict tables (extensions + wavelet A/B + energy pair)"

echo "r04 resume done at $(date)"
