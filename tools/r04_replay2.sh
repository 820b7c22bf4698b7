#!/bin/bash
# Round-4 SECOND replay queue (after the 2026-08-20 ~09:08 UTC VM reset wiped
# /tmp + the XLA cache and killed the resume/stack/ext180/ext270 chains).
# Consolidates everything still missing into ONE serial script, short
# high-value phases FIRST (VM resets keep eating the tail):
#   1. tools/bench_stack.py -> STACK_BENCH_r04.json — first real-TPU Mosaic
#      validation + perf A/B of use_pallas_stack; the round-end bench.py
#      auto-selects this path, so validating it is pre-requisite safety.
#   2. bench.py sanity run (headline path end-to-end on hardware).
#   3. energy GAN branch +90 min (energy_fm50_ext90) — the conditional
#      extension that was mid-flight when the VM reset hit (gate already
#      passed: energy_fm50 beat its control 2/3).
#   4. GAN branch to 180 cumulative fine-tune minutes (fm50_ext180).
#   5. GAN branch to 270 minutes (fm50_ext270, from the ext180 snapshot).
#   6. conditional SECOND energy extension if energy_fm50_ext90 escaped the
#      phase floor (SI-SDR > -20 dB).
#   7. final report/markdown/commit.
# Every phase is artifact-guarded (idempotent across watchdog relaunches)
# and timeout-bounded (CLAUDE.md wedge protocol). Serial TPU only.
set -x
cd "$(dirname "$0")/.."
echo $$ > /tmp/r04_replay2.pid

run_phase() {  # run_phase <timeout_s> <log> <cmd...> ; returns the phase rc
    local T="$1" LOG="$2"; shift 2
    timeout "$T" "$@" > "$LOG" 2>&1 &
    echo $! > /tmp/gan_run.pid
    ln -sf "$LOG" /tmp/gan_run.log
    wait $!
    local rc=$?
    echo "phase '$3 $4 $5' exited $rc at $(date)"
    return $rc
}

commit_sweep() {
    # NOTE: one git add per maybe-missing path — a single pathspec list
    # ABORTS WHOLLY on one missing path (CLAUDE.md, fifth continuation)
    git add -A QUALITY_r04 QUALITY_r04.md artifacts 2>/dev/null
    git add GANFT_SWEEP_r04.json 2>/dev/null
    git add STACK_BENCH_r04.json 2>/dev/null
    git diff --cached --quiet || git commit -q -m "$1"
}

# compile-helper probe with retries (tunnel cold start after a VM boot can
# exceed 300 s; two failed attempts before a pass is normal)
probe_ok=""
for attempt in 1 2 3 4; do
    run_phase 300 /tmp/r04_rp2_probe.log python -u -c "
import jax, jax.numpy as jnp
print(jax.jit(lambda x: (x @ x).sum())(jnp.ones((256, 256))))"
    if grep -q "16777216" /tmp/r04_rp2_probe.log; then probe_ok=1; break; fi
    echo "probe attempt $attempt failed; retrying in 120s"
    sleep 120
done
[ -n "$probe_ok" ] || { echo "compile-helper probe FAILED 4x; aborting"; exit 1; }

# --- 1. fused residual-stack Pallas kernel: TPU Mosaic + perf A/B ---
[ -f STACK_BENCH_r04.json ] || \
    run_phase 3600 /tmp/r04_stack_bench.log python -u tools/bench_stack.py
commit_sweep "STACK_BENCH_r04: TPU A/B of the fused residual-stack Pallas kernel vs XLA"

# --- 2. bench.py sanity (auto-selected headline path, cold cache) ---
# marker only on success (ADVICE r4: an unconditional touch marked a failed
# bench done and a watchdog relaunch would never retry it)
if [ ! -f /tmp/r04_bench_sanity.done ]; then
    if run_phase 2400 /tmp/r04_bench_sanity.log python -u bench.py; then
        tail -1 /tmp/r04_bench_sanity.log
        touch /tmp/r04_bench_sanity.done
    fi
fi

# --- 3. energy GAN branch +90 min (was mid-flight at the reset) ---
[ -f QUALITY_r04/sweep/energy_fm50_ext90.json ] || \
    run_phase 7200 /tmp/r04_q4_energyext.log \
        python -u tools/energy_ganft.py extend ganft_energy_fm50 90
timeout 600 python tools/ganft_sweep.py report > /tmp/r04_rp2_report1.log 2>&1
timeout 600 python tools/quality_r04.py --markdown >> /tmp/r04_rp2_report1.log 2>&1
commit_sweep "GANFT_SWEEP_r04: energy GAN branch +90 min (energy_fm50_ext90)"

# --- 4. GAN branch to 180 cumulative fine-tune minutes ---
if [ ! -f QUALITY_r04/sweep/fm50_ext180.json ] && \
   [ -f artifacts/ckpt/ganft_fm50_ext90.npz ]; then
    run_phase 7200 /tmp/r04_ext180_gan.log \
        python -u tools/ganft_sweep.py extend fm50 ganft_fm50_ext90 90 fm50_ext180
    timeout 600 python tools/ganft_sweep.py report >> /tmp/r04_ext180_gan.log 2>&1
    timeout 600 python tools/quality_r04.py --markdown >> /tmp/r04_ext180_gan.log 2>&1
    commit_sweep "GANFT_SWEEP_r04: GAN branch to 180 fine-tune minutes (fm50_ext180)"
fi

# --- 5. GAN branch to 270 minutes ---
if [ ! -f QUALITY_r04/sweep/fm50_ext270.json ] && \
   [ -f artifacts/ckpt/ganft_fm50_ext180.npz ]; then
    run_phase 7200 /tmp/r04_ext270_gan.log \
        python -u tools/ganft_sweep.py extend fm50 ganft_fm50_ext180 90 fm50_ext270
    timeout 600 python tools/ganft_sweep.py report >> /tmp/r04_ext270_gan.log 2>&1
    timeout 600 python tools/quality_r04.py --markdown >> /tmp/r04_ext270_gan.log 2>&1
    commit_sweep "GANFT_SWEEP_r04: GAN branch to 270 fine-tune minutes (fm50_ext270)"
fi

# --- 6. conditional second energy extension (phase-floor escape gate) ---
# local-JSON read only: skip the axon PJRT dial (PYTHONPATH=) and bound it,
# defaulting to "no" on timeout (ADVICE r4: the undialed default PYTHONPATH
# could block here forever, invisible to the watchdog)
ENERGY_GO=$(PYTHONPATH= timeout 300 python - <<'EOF'
import json
try:
    after = json.load(open("QUALITY_r04/sweep/energy_fm50_ext90.json"))["after"]
    print("yes" if after.get("si_sdr_db", -99.0) > -20.0 else "no")
except Exception:
    print("no")
EOF
)
if [ "$ENERGY_GO" = "yes" ] && \
   [ ! -f QUALITY_r04/sweep/energy_fm50_ext90_ext90.json ] && \
   [ -f artifacts/ckpt/ganft_energy_fm50_ext90.npz ]; then
    run_phase 7200 /tmp/r04_ext270_energy.log \
        python -u tools/energy_ganft.py extend ganft_energy_fm50_ext90 90
    timeout 600 python tools/ganft_sweep.py report >> /tmp/r04_ext270_energy.log 2>&1
    timeout 600 python tools/quality_r04.py --markdown >> /tmp/r04_ext270_energy.log 2>&1
    commit_sweep "GANFT_SWEEP_r04: energy GAN branch +90 min more (phase-floor follow-up)"
else
    echo "skipping second energy extension (gate=$ENERGY_GO)"
fi

# --- 7. final aggregate + render + commit ---
timeout 600 python tools/ganft_sweep.py report > /tmp/r04_rp2_report2.log 2>&1
timeout 600 python tools/quality_r04.py --markdown >> /tmp/r04_rp2_report2.log 2>&1
commit_sweep "QUALITY_r04: final round-4 verdict tables (GAN curve + energy extensions)"

echo "r04 replay2 done at $(date)"
