#!/bin/bash
# Round-3 post-campaign TPU queue #2, SERIAL. Chained after r03d by
# tools/chain_r03e.sh (waits for r03d's done-marker). Contents:
#   1. SWAP re-run with the fixed tool (the first SWAP_r03.json recorded
#      flat duplicate recovery points from the dead-StopIteration bug)
#   2. om.wav real-audio round-trip on the FRESH no-GAN flagship
#   3. batch/clip sweep of the inference headline (SWEEP_r03.json)
set -x
cd "$(dirname "$0")/.."

run_phase() {  # run_phase <timeout_s> <log> <cmd...>
    local T="$1" LOG="$2"; shift 2
    timeout "$T" "$@" > "$LOG" 2>&1 &
    echo $! > /tmp/gan_run.pid
    ln -sf "$LOG" /tmp/gan_run.log
    wait $!
    echo "phase '$3 $4' exited $? at $(date)"
}

run_phase 3600 /tmp/r03e_swap.log python -u tools/swap_r03.py --epochs 6

run_phase 2400 /tmp/r03e_om.log \
    python -u tools/om_demo.py rvq8_hifi --animate

run_phase 3600 /tmp/r03e_sweep.log python -u tools/bench_sweep.py

# extend the flagship past the previous run's 20.2k-step horizon (the 4h
# r03d budget lands short of it; --force resumes from the checkpoint and
# overwrites the final artifact with the extended numbers)
run_phase 9000 /tmp/r03e_extend.log \
    python -u tools/quality_r03.py --dtype bfloat16 --force \
        --hours-per-config 1.5 rvq8_hifi

timeout 300 python tools/quality_r03.py --markdown > /tmp/r03e_md.log 2>&1

echo "r03e queue done at $(date)"
