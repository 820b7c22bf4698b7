#!/bin/bash
# Round-3 (third continuation) TPU queue, SERIAL (never overlap TPU compiles
# — CLAUDE.md wedge protocol). The VM reset wiped the rvq8_hifi flagship
# checkpoint, so this queue:
#   1. re-trains the no-GAN flagship with a bigger budget (beats the old
#      +7.3 dB number and restores the donor checkpoint),
#   2. GAN-fine-tunes that checkpoint (tools/gan_ft_r03.py) — the standard
#      converge-then-adversarial recipe, the defensible test of the
#      reference's one-discriminator claim,
#   3. regenerates QUALITY_r03.md, re-runs bench.py.
# Each phase is timeout-bounded with its PID in /tmp/gan_run.pid so
# tools/watch_campaign.sh can spot a wedged remote compile.
#
# Usage: tools/r03d_queue.sh [nogan_hours] [ganft_hours]
set -x
cd "$(dirname "$0")/.."

NOGAN_HOURS="${1:-4.0}"
GANFT_HOURS="${2:-1.5}"

run_phase() {  # run_phase <timeout_s> <log> <cmd...>
    local T="$1" LOG="$2"; shift 2
    timeout "$T" "$@" > "$LOG" 2>&1 &
    echo $! > /tmp/gan_run.pid
    ln -sf "$LOG" /tmp/gan_run.log
    wait $!
    echo "phase '$3 $4' exited $? at $(date)"
}

# 0. sanity-probe the remote compile helper (wedge protocol): a trivial jit
#    must return. Retry with backoff — right after a watchdog kill the
#    tunnel can be transiently busy tearing the old session down (a single
#    180 s probe once aborted an otherwise-recoverable relaunch).
probe_ok=""
for attempt in 1 2 3 4; do
    run_phase 300 /tmp/r03d_probe.log python -u -c "
import jax, jax.numpy as jnp
print(jax.jit(lambda x: (x @ x).sum())(jnp.ones((256, 256))))"
    if grep -q "16777216" /tmp/r03d_probe.log; then probe_ok=1; break; fi
    echo "probe attempt $attempt failed; retrying in 120s"
    sleep 120
done
[ -n "$probe_ok" ] || { echo "compile-helper probe FAILED 4x; aborting queue"; exit 1; }

# keep the previous flagship result for history before --force overwrites it
[ -f QUALITY_r03/rvq8_hifi.json ] && [ ! -f QUALITY_r03/rvq8_hifi.r03b.json ] \
    && cp QUALITY_r03/rvq8_hifi.json QUALITY_r03/rvq8_hifi.r03b.json

# 1. no-GAN flagship, fresh (run dir gone; --force because the artifact
#    exists). Resumable from QUALITY_r03/runs if this script is relaunched.
run_phase $(( ${NOGAN_HOURS%.*} * 3600 + 3600 )) /tmp/r03d_nogan.log \
    python -u tools/quality_r03.py --dtype bfloat16 --force \
        --hours-per-config "$NOGAN_HOURS" rvq8_hifi

# 2. GAN fine-tune of the trained checkpoint (seeds the step-0 transplant,
#    then the budgeted adversarial run; resumable the same way).
run_phase $(( ${GANFT_HOURS%.*} * 3600 + 3600 )) /tmp/r03d_ganft.log \
    python -u tools/gan_ft_r03.py --dtype bfloat16 --hours "$GANFT_HOURS"

# 3. regenerate the quality markdown from all final jsons (CPU-fast)
timeout 300 python tools/quality_r03.py --markdown > /tmp/r03d_md.log 2>&1

# 4. headline bench (post-campaign, compile cache warm)
run_phase 2400 /tmp/r03d_bench.log python -u bench.py

echo "r03d queue done at $(date)"
