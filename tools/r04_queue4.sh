#!/bin/bash
# Round-4 queue 4 (overnight): extend the matched GAN-vs-control wall-clock
# curves. The 90-min GAN fine-tune (fm50_long90) was still improving
# monotonically at cutoff (SI-SDR -38 -> -22 dB over its last 3k steps), so
# each branch gets +90 min from its own committed snapshot:
#   1. fm50 GAN branch      <- artifacts/ckpt/ganft_fm50_long90.npz
#   2. no-GAN control branch <- artifacts/ckpt/ganft_nogan_long90.npz
#   3. (conditional) energy-flagship GAN fine-tune +90 min, only if queue2's
#      45-min energy GAN beat its matched no-GAN control on >=2 of
#      {mel, MCD, STOI*}.
# Chained on queue3's done-marker; serial TPU; timeout-bounded phases
# (CLAUDE.md wedge protocol); each phase commits its artifacts.
set -x
cd "$(dirname "$0")/.."
echo $$ > /tmp/r04_queue4.pid

while ! grep -q "^r04 queue3 done" /tmp/r04_queue3.log 2>/dev/null; do
    sleep 120
done

run_phase() {  # run_phase <timeout_s> <log> <cmd...>
    local T="$1" LOG="$2"; shift 2
    timeout "$T" "$@" > "$LOG" 2>&1 &
    echo $! > /tmp/gan_run.pid
    ln -sf "$LOG" /tmp/gan_run.log
    wait $!
    echo "phase '$3 $4 $5' exited $? at $(date)"
}

commit_artifacts() {
    git add -A QUALITY_r04 QUALITY_r04.md GANFT_SWEEP_r04.json artifacts 2>/dev/null
    git diff --cached --quiet || git commit -q -m "$1"
}

probe_ok=""
for attempt in 1 2 3 4; do
    run_phase 300 /tmp/r04_q4_probe.log python -u -c "
import jax, jax.numpy as jnp
print(jax.jit(lambda x: (x @ x).sum())(jnp.ones((256, 256))))"
    if grep -q "16777216" /tmp/r04_q4_probe.log; then probe_ok=1; break; fi
    echo "probe attempt $attempt failed; retrying in 120s"
    sleep 120
done
[ -n "$probe_ok" ] || { echo "compile-helper probe FAILED 4x; aborting"; exit 1; }

# 1: GAN branch +90 min (compile-cached from the sweep)
run_phase 7200 /tmp/r04_q4_fm50ext.log \
    python -u tools/ganft_sweep.py extend fm50 ganft_fm50_long90 90
timeout 600 python tools/ganft_sweep.py report >> /tmp/r04_q4_fm50ext.log 2>&1
commit_artifacts "GANFT_SWEEP_r04: GAN branch +90 min (fm50_ext90) from the long-run snapshot"

# 2: no-GAN control branch +90 min (matched)
run_phase 7200 /tmp/r04_q4_noganext.log \
    python -u tools/ganft_sweep.py extend nogan ganft_nogan_long90 90
timeout 600 python tools/ganft_sweep.py report >> /tmp/r04_q4_noganext.log 2>&1
commit_artifacts "GANFT_SWEEP_r04: no-GAN control branch +90 min (nogan_ext90)"

# 3: conditional — extend the energy GAN fine-tune only if it beat its
# matched no-GAN control at 45 min on >=2 of {mel, MCD, STOI*}
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

timeout 600 python tools/ganft_sweep.py report > /tmp/r04_q4_report.log 2>&1
timeout 600 python tools/quality_r04.py --markdown >> /tmp/r04_q4_report.log 2>&1
commit_artifacts "QUALITY_r04: extended GAN-vs-control curves (+90 min per branch)"

echo "r04 queue4 done at $(date)"
