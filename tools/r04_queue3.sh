#!/bin/bash
# Round-4 queue 3: wavelet-decoder A/B (tools/wavelet_ab.py) — measures the
# reference's plot-only wavelet-upsampler claim (networks/wavelets.py:286-307)
# as a from-scratch matched-wall-clock head-to-head on the speech campaign
# data. Chained on queue2's done-marker; serial TPU; timeout-bounded phases
# (CLAUDE.md wedge protocol).
set -x
cd "$(dirname "$0")/.."
echo $$ > /tmp/r04_queue3.pid

while ! grep -q "r04 queue2 done" /tmp/r04_queue2.log 2>/dev/null; do
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

probe_ok=""
for attempt in 1 2 3 4; do
    run_phase 300 /tmp/r04_q3_probe.log python -u -c "
import jax, jax.numpy as jnp
print(jax.jit(lambda x: (x @ x).sum())(jnp.ones((256, 256))))"
    if grep -q "16777216" /tmp/r04_q3_probe.log; then probe_ok=1; break; fi
    echo "probe attempt $attempt failed; retrying in 120s"
    sleep 120
done
[ -n "$probe_ok" ] || { echo "compile-helper probe FAILED 4x; aborting"; exit 1; }

# wav first (its step_fn is compile-cached from the campaign; ups compiles
# a fresh decoder graph)
run_phase 4800 /tmp/r04_q3_wav.log python -u tools/wavelet_ab.py run wav 40
run_phase 6000 /tmp/r04_q3_ups.log python -u tools/wavelet_ab.py run ups 40

timeout 600 python tools/wavelet_ab.py report > /tmp/r04_q3_report.log 2>&1
git add -A QUALITY_r04/wavelet_ab WAVELET_AB_r04.json 2>/dev/null
git diff --cached --quiet || git commit -q -m \
    "WAVELET_AB_r04: wavelet vs learned-upsample decoder head-to-head (matched wall-clock)"

echo "r04 queue3 done at $(date)"
