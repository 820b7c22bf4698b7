#!/bin/bash
# Round-4 follow-on queue: the CONTROL runs that make the adversarial-balance
# sweep interpretable, plus the energy-flagship GAN test (the donor that is
# NOT phase-floored on PseudoSpeech — if an adversary helps anywhere in this
# framework, it is there).
#
# Waits for the sweep queue's done-marker, then serially (one TPU compile at
# a time, each phase timeout-bounded per the CLAUDE.md wedge protocol):
#   1. no-GAN control of the rvq8 donor, 20 min (matches the fm* short rows)
#   2. no-GAN control at the long-run budget, 90 min (matches <best>_long90)
#   3. energy flagship GAN fine-tune, 45 min (fm = sweep winner's)
#   4. energy flagship no-GAN control, 45 min
#   5. om.wav real-audio demo through the energy flagship
#   6. report + markdown + commit
#
# Usage: tools/r04_queue2.sh
set -x
cd "$(dirname "$0")/.."
echo $$ > /tmp/r04_queue2.pid

while ! grep -q "r04 sweep queue done" /tmp/r04_sweep_queue.log 2>/dev/null; do
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

# compile-helper probe with retries (tunnel transiently busy after a kill)
probe_ok=""
for attempt in 1 2 3 4; do
    run_phase 300 /tmp/r04_q2_probe.log python -u -c "
import jax, jax.numpy as jnp
print(jax.jit(lambda x: (x @ x).sum())(jnp.ones((256, 256))))"
    if grep -q "16777216" /tmp/r04_q2_probe.log; then probe_ok=1; break; fi
    echo "probe attempt $attempt failed; retrying in 120s"
    sleep 120
done
[ -n "$probe_ok" ] || { echo "compile-helper probe FAILED 4x; aborting"; exit 1; }

# 1+2: no-GAN controls of the rvq8 donor (short + long-budget)
run_phase 4500 /tmp/r04_q2_nogan.log \
    python -u tools/ganft_sweep.py run nogan 20
run_phase 9000 /tmp/r04_q2_nogan_long.log \
    python -u tools/ganft_sweep.py long nogan 90
commit_artifacts "GANFT_SWEEP_r04: no-GAN controls (20 min + 90 min) of the rvq8 donor"

# 3+4: energy flagship — GAN fine-tune (sweep winner's fm) vs no-GAN control
run_phase 7200 /tmp/r04_q2_energy_fm.log \
    python -u tools/energy_ganft.py run 45
run_phase 7200 /tmp/r04_q2_energy_nogan.log \
    python -u tools/energy_ganft.py run 45 nogan
commit_artifacts "GANFT_SWEEP_r04: energy-flagship GAN fine-tune vs no-GAN control"

# 5: real-audio demo through the energy flagship (om.wav round-trip)
run_phase 1800 /tmp/r04_q2_om.log \
    python -u tools/om_demo.py energy_rvq_speech

# 5b: serving cost of the quality flagship (energy-descent bottleneck)
run_phase 3600 /tmp/r04_q2_bench_energy.log \
    python -u tools/bench_energy.py
git add -A ENERGY_BENCH_r04.json 2>/dev/null
git diff --cached --quiet || git commit -q -m \
    "ENERGY_BENCH_r04: inference throughput of the energy_rvq codec vs n_iters"

# 6: aggregate + render + commit
timeout 600 python tools/ganft_sweep.py report > /tmp/r04_q2_report.log 2>&1
timeout 600 python tools/quality_r04.py --markdown >> /tmp/r04_q2_report.log 2>&1
commit_artifacts "QUALITY_r04: GAN-vs-control verdict rows (rvq8 + energy donors) + om energy demo"

echo "r04 queue2 done at $(date)"
