#!/bin/bash
# Round-5 serial TPU queue — executes the VERDICT r4 task list with the
# round-4 lessons baked in:
#   * SHORT, ARTIFACT-GUARDED phases, committed as each lands (VM resets
#     keep eating long tails);
#   * every phase has a hard `timeout` (wedge protocol, CLAUDE.md);
#   * a STOP_BY deadline: no training phase may start unless it can finish
#     comfortably before the round's final hour (VERDICT r4 weak #1 — two
#     rounds ended mid-pipeline);
#   * yields to a driver bench: waits while /tmp/tpu_bench.lock exists
#     (bench.py writes it; VERDICT r4 task 2).
# Phases:
#   0. wait for the inherited energy_fm50_ext90 extension to finish; land it
#   1. tools/bench_stack.py -> STACK_BENCH_r05.json (Mosaic fix validation)
#   2. seed replication: (fm50, nogan) x seeds {1,2} at 30 matched minutes
#      -> SEEDS_r05.json (VERDICT task 4)
#   3. from-scratch tuned GAN at 42 min (matched to the wavelet-A/B "wav"
#      arm = the same config no-GAN from scratch) (VERDICT task 5)
#   4. wavelet A/B "ups" arm re-run at matched 41.9 min (VERDICT task 6)
#   5. energy_rvq streaming measurement (VERDICT task 7)
#   6. final reports + bench sanity + commits
set -x
cd "$(dirname "$0")/.."
echo $$ > /tmp/r05_queue.pid

STOP_TS=$(date -d "today 19:45" +%s 2>/dev/null || echo 0)
NOW0=$(date +%s)
# if relaunched after midnight-ish weirdness or STOP already passed, give
# the final consolidation phase a fighting chance anyway
[ "$STOP_TS" -gt "$NOW0" ] || STOP_TS=$((NOW0 + 600))

phase_ok() {  # phase_ok <needed_minutes> — enough budget before STOP_BY?
    [ $(( $(date +%s) + $1 * 60 )) -lt "$STOP_TS" ]
}

wait_bench_lock() {  # a driver bench has priority on the chip
    local n=0
    while [ -f /tmp/tpu_bench.lock ] && [ "$n" -lt 60 ]; do
        sleep 30; n=$((n + 1))
    done
}

run_phase() {  # run_phase <timeout_s> <log> <cmd...> ; returns phase rc
    local T="$1" LOG="$2"; shift 2
    wait_bench_lock
    timeout "$T" "$@" > "$LOG" 2>&1 &
    echo $! > /tmp/gan_run.pid
    ln -sf "$LOG" /tmp/gan_run.log
    wait $!
    local rc=$?
    echo "phase '$3 $4 $5' exited $rc at $(date)"
    return $rc
}

reports() {  # aggregate + render (CPU only, axon dial skipped)
    PYTHONPATH= timeout 600 python tools/ganft_sweep.py report >> /tmp/r05_reports.log 2>&1
    PYTHONPATH= timeout 600 python tools/seeds_report.py >> /tmp/r05_reports.log 2>&1
    PYTHONPATH= timeout 600 python tools/wavelet_ab.py report >> /tmp/r05_reports.log 2>&1
    PYTHONPATH= timeout 900 python tools/quality_r04.py --markdown >> /tmp/r05_reports.log 2>&1
}

commit_r05() {
    # one git add per maybe-missing path — a single pathspec list ABORTS
    # WHOLLY on one missing path (CLAUDE.md, round-4 lesson)
    git add -A QUALITY_r04 QUALITY_r04.md artifacts 2>/dev/null
    for f in GANFT_SWEEP_r04.json SEEDS_r05.json STACK_BENCH_r05.json \
             WAVELET_AB_r04.json STREAM_ENERGY_r05.json; do
        git add "$f" 2>/dev/null
    done
    git diff --cached --quiet || git commit -q -m "$1"
}

# --- compile-helper probe with retries (tunnel cold start can exceed 300 s)
probe_ok=""
for attempt in 1 2 3 4; do
    run_phase 300 /tmp/r05_probe.log python -u -c "
import jax, jax.numpy as jnp
print(jax.jit(lambda x: (x @ x).sum())(jnp.ones((256, 256))))"
    if grep -q "16777216" /tmp/r05_probe.log; then probe_ok=1; break; fi
    echo "probe attempt $attempt failed; retrying in 120s"
    sleep 120
done
[ -n "$probe_ok" ] || { echo "compile-helper probe FAILED 4x; aborting"; exit 1; }

# --- 0. inherited energy extension: wait for it, then land its artifacts ---
EXT_PID=19134  # the in-flight `energy_ganft.py extend` inherited from the
# round-4 replay queue (this session killed that queue's script, not the run)
n=0
while kill -0 "$EXT_PID" 2>/dev/null \
      && [ ! -f QUALITY_r04/sweep/energy_fm50_ext90.json ] \
      && [ "$n" -lt 240 ]; do
    sleep 30; n=$((n + 1))
done
sleep 30  # let the run finish writing its artifacts after the json lands
if [ ! -f QUALITY_r04/sweep/energy_fm50_ext90.json ]; then
    # the extension was SIGTERMed by its inherited 7200 s timeout ~4 min
    # early — finish it from the surviving step-5110 checkpoint (held-out
    # eval + npz snapshot + sweep row; tools/finish_energy_ext.py)
    run_phase 2400 /tmp/r05_finish_energy.log \
        python -u tools/finish_energy_ext.py
fi
if [ -f QUALITY_r04/sweep/energy_fm50_ext90.json ]; then
    reports
    commit_r05 "GANFT_SWEEP_r04: energy GAN branch +90 min (energy_fm50_ext90)"
fi

# --- 1. fused-stack Pallas kernel: Mosaic-fix validation + perf A/B ---
if [ ! -f STACK_BENCH_r05.json ] && phase_ok 50; then
    run_phase 2700 /tmp/r05_stack_bench.log python -u tools/bench_stack.py
    commit_r05 "STACK_BENCH_r05: TPU Mosaic validation + A/B of the fused residual-stack kernel"
fi

# --- 2. seed replication of the GAN-vs-control claim (VERDICT task 4) ---
for s in 1 2; do
    for arm in fm50 nogan; do
        out="QUALITY_r04/sweep/${arm}_s${s}m30.json"
        if [ ! -f "$out" ] && phase_ok 48; then
            run_phase 3000 "/tmp/r05_seed_${arm}_s${s}.log" \
                python -u tools/ganft_sweep.py seedrun "$arm" "$s" 30
        fi
    done
    if [ -f "QUALITY_r04/sweep/fm50_s${s}m30.json" ] && \
       [ -f "QUALITY_r04/sweep/nogan_s${s}m30.json" ]; then
        reports
        commit_r05 "SEEDS_r05: GAN-vs-control replication pair at seed ${s} (30 matched min)"
    fi
done

# --- 3. from-scratch tuned GAN at matched 42 min (VERDICT task 5) ---
if [ ! -f QUALITY_r04/sweep/scratch_fm50_m42.json ] && phase_ok 65; then
    run_phase 3900 /tmp/r05_scratch_gan.log \
        python -u tools/ganft_sweep.py scratchrun fm50 42 scratch_fm50_m42
    reports
    commit_r05 "GANFT_SWEEP_r04: tuned recipe from scratch at 42 min (vs wavelet-A/B wav control)"
fi

# --- 4. wavelet A/B: matched-budget "ups" arm re-run (VERDICT task 6) ---
if [ ! -f QUALITY_r04/wavelet_ab/ups_m42.json ] && phase_ok 65; then
    run_phase 3900 /tmp/r05_wavelet_ups.log \
        python -u tools/wavelet_ab.py run ups 41.9 ups_m42
    reports
    commit_r05 "WAVELET_AB: learned-upsample arm re-run at matched 41.9 min"
fi

# --- 5. energy_rvq streaming measurement (VERDICT task 7) ---
if [ -f tools/stream_energy_r05.py ] && [ ! -f STREAM_ENERGY_r05.json ] \
   && phase_ok 35; then
    run_phase 2100 /tmp/r05_stream_energy.log \
        python -u tools/stream_energy_r05.py
    commit_r05 "STREAM_ENERGY_r05: chunked streaming on the energy_rvq flagship"
fi

# --- 6. final aggregate + bench sanity + commit (always runs) ---
reports
run_phase 1800 /tmp/r05_bench_sanity.log python -u bench.py
tail -1 /tmp/r05_bench_sanity.log
commit_r05 "r05 queue: final reports + bench sanity"

echo "r05 queue done at $(date)"
