#!/bin/bash
# Round-3 (second continuation) TPU queue. The VM was reset since the first
# campaign, so run-dir checkpoints and the XLA cache are gone: this re-runs
# the GAN flagship from scratch for the bulk of the session's wall-clock,
# then the experiments that need its trained checkpoint, SERIALLY (never
# overlap TPU compiles — CLAUDE.md wedge protocol). Each phase is
# timeout-bounded; each phase's python PID is written to /tmp/gan_run.pid so
# tools/watch_campaign.sh can spot a wedged remote compile.
#
# Usage: tools/r03c_queue.sh [gan_hours]
set -x
cd "$(dirname "$0")/.."

HOURS="${1:-5.0}"

run_phase() {  # run_phase <timeout_s> <log> <cmd...>
    local T="$1" LOG="$2"; shift 2
    timeout "$T" "$@" > "$LOG" 2>&1 &
    echo $! > /tmp/gan_run.pid
    ln -sf "$LOG" /tmp/gan_run.log
    wait $!
    echo "phase '$3 $4' exited $? at $(date)"
}

# 1. GAN flagship, fresh run (rvq8_gan_hifi.json absent -> runs; resumable
#    from QUALITY_r03/runs if this script is relaunched after a wedge kill).
run_phase 21600 /tmp/r03c_gan.log \
    python -u tools/quality_r03.py --dtype bfloat16 \
        --hours-per-config "$HOURS" rvq8_gan_hifi

# 2. regenerate the quality markdown from all final jsons (CPU-fast)
timeout 300 python tools/quality_r03.py --markdown > /tmp/r03c_md.log 2>&1

# 3. one-sampled vs full-bank discriminator head-to-head (reference
#    README.md:58 claim). Sampled-variant step_fns are in the XLA cache
#    from phase 1; full-bank adds one big compile.
run_phase 7200 /tmp/r03c_onedisc.log \
    python -u tools/onedisc_r03.py --dtype bfloat16 --mini-epochs 24

# 4. bottleneck swap on the trained GAN checkpoint (train_new_quantizer demo)
run_phase 3600 /tmp/r03c_swap.log python -u tools/swap_r03.py --epochs 4

# 5. real-audio round-trip + codebook animation from the trained checkpoint
run_phase 2400 /tmp/r03c_om.log \
    python -u tools/om_demo.py rvq8_gan_hifi --animate

# 6. current per-stage inference ablation (perf record for the round)
run_phase 2400 /tmp/r03c_ablate.log python -u tools/profile_ablate.py

echo "r03c queue done at $(date)"
