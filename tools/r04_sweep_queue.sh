#!/bin/bash
# Adversarial-balance sweep queue (round 4, after the main campaign):
# waits for chain_r04_final's done-marker, then runs tools/ganft_sweep.py
# variants serially (one TPU compile at a time), aggregates, re-renders the
# campaign markdown, and commits. Per-variant `timeout` bounds a wedged
# remote compile externally (in-process deadlines cannot fire while the
# compile RPC is blocked — CLAUDE.md wedge protocol).
#
# Usage: tools/r04_sweep_queue.sh [minutes_per_variant]
set -x
cd "$(dirname "$0")/.."
echo $$ > /tmp/r04_sweep_queue.pid

MIN="${1:-20}"

while ! grep -q "chain_r04_final done" /tmp/r04_chain.log 2>/dev/null; do
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

# compile-helper probe with retries (tunnel can be transiently busy right
# after the parity check)
probe_ok=""
for attempt in 1 2 3 4; do
    run_phase 300 /tmp/r04_sweep_probe.log python -u -c "
import jax, jax.numpy as jnp
print(jax.jit(lambda x: (x @ x).sum())(jnp.ones((256, 256))))"
    if grep -q "16777216" /tmp/r04_sweep_probe.log; then probe_ok=1; break; fi
    echo "probe attempt $attempt failed; retrying in 120s"
    sleep 120
done
[ -n "$probe_ok" ] || { echo "compile-helper probe FAILED 4x; aborting"; exit 1; }

for tag in fm0 fm2 fm10 fm50; do
    run_phase 3000 "/tmp/r04_sweep_${tag}.log" \
        python -u tools/ganft_sweep.py run "$tag" "$MIN"
done

timeout 600 python tools/ganft_sweep.py report > /tmp/r04_sweep_report.log 2>&1
timeout 600 python tools/quality_r04.py --markdown >> /tmp/r04_sweep_report.log 2>&1
git add -A QUALITY_r04/sweep GANFT_SWEEP_r04.json QUALITY_r04.md 2>/dev/null
git diff --cached --quiet || git commit -q -m \
    "GANFT_SWEEP_r04: feature-multiplier balance sweep of the GAN fine-tune"

# budgeted fine-tune of the sweep winner (held-out STOI*): the tuned-balance
# GAN-vs-no-GAN comparison at real wall-clock, snapshot committed
LONG_MIN=90
BEST=$(timeout 600 python tools/ganft_sweep.py best 2>/dev/null | tail -1)
if [ -n "$BEST" ]; then
    run_phase 7800 /tmp/r04_sweep_long.log \
        python -u tools/ganft_sweep.py long "$BEST" "$LONG_MIN"
    timeout 600 python tools/ganft_sweep.py report >> /tmp/r04_sweep_report.log 2>&1
    timeout 600 python tools/quality_r04.py --markdown >> /tmp/r04_sweep_report.log 2>&1
    git add -A QUALITY_r04/sweep GANFT_SWEEP_r04.json QUALITY_r04.md artifacts 2>/dev/null
    git diff --cached --quiet || git commit -q -m \
        "GANFT_SWEEP_r04: ${LONG_MIN}-min fine-tune of sweep winner ${BEST} + snapshot"
fi

echo "r04 sweep queue done at $(date)"
