#!/bin/bash
# Round-4 serial TPU queue (never overlap TPU compiles — CLAUDE.md wedge
# protocol). The full PseudoSpeech campaign:
#   1. rvq8_speech       no-GAN flagship (donor + wall-clock anchor)
#   2. rvq8_gan_ft_speech seeded GAN fine-tune (converge-then-adversarial,
#                         tuned fm=2 / equal 2e-4 LRs)
#   3. rvq8_gan_speech   from-scratch GAN at matched wall-clock (tuned fm=10)
#   4. energy_rvq_speech energy bottleneck CODED through RVQ (real bitrate)
#   5. markdown + headline bench
# After every phase the artifacts (jsons, wavs, npz snapshots) are COMMITTED
# so a VM reset can never again orphan the published numbers (VERDICT r3
# weak #1). Phases are timeout-bounded with the phase PID in
# /tmp/gan_run.pid for tools/queue_watchdog.sh.
#
# Usage: tools/r04_queue.sh [h1 h2 h3 h4]
set -x
cd "$(dirname "$0")/.."
# the SCRIPT writes its own pid: `setsid ... &` forks, so a launcher-side
# `echo $!` records the wrong pid and the watchdog relaunches a live queue
# (observed 02:34 this round — two concurrent TPU dials)
echo $$ > /tmp/r04_queue.pid

H1="${1:-2.6}"   # rvq8_speech
H2="${2:-1.5}"   # rvq8_gan_ft_speech
H3="${3:-1.8}"   # rvq8_gan_speech
H4="${4:-1.3}"   # energy_rvq_speech

run_phase() {  # run_phase <timeout_s> <log> <cmd...>
    local T="$1" LOG="$2"; shift 2
    timeout "$T" "$@" > "$LOG" 2>&1 &
    echo $! > /tmp/gan_run.pid
    ln -sf "$LOG" /tmp/gan_run.log
    wait $!
    echo "phase '$3 $4' exited $? at $(date)"
}

commit_artifacts() {  # commit_artifacts <msg>
    git add -A QUALITY_r04 QUALITY_r04.md artifacts 2>/dev/null
    git diff --cached --quiet || git commit -q -m "$1"
}

hours_to_timeout() { python3 -c "import sys; print(int(float(sys.argv[1])*3600 + 3600))" "$1"; }

# 0. compile-helper probe with retries (wedge protocol)
probe_ok=""
for attempt in 1 2 3 4; do
    run_phase 300 /tmp/r04_probe.log python -u -c "
import jax, jax.numpy as jnp
print(jax.jit(lambda x: (x @ x).sum())(jnp.ones((256, 256))))"
    if grep -q "16777216" /tmp/r04_probe.log; then probe_ok=1; break; fi
    echo "probe attempt $attempt failed; retrying in 120s"
    sleep 120
done
[ -n "$probe_ok" ] || { echo "compile-helper probe FAILED 4x; aborting"; exit 1; }

# 1. no-GAN flagship
run_phase "$(hours_to_timeout "$H1")" /tmp/r04_p1.log \
    python -u tools/quality_r04.py --dtype bfloat16 \
        --hours-per-config "$H1" rvq8_speech
commit_artifacts "QUALITY_r04: rvq8_speech no-GAN flagship (PseudoSpeech) + snapshot"

# 2. GAN fine-tune (seed transplant, then the budgeted adversarial run)
run_phase 1800 /tmp/r04_p2seed.log \
    python -u tools/quality_r04.py --dtype bfloat16 --seed-ganft
run_phase "$(hours_to_timeout "$H2")" /tmp/r04_p2.log \
    python -u tools/quality_r04.py --dtype bfloat16 \
        --hours-per-config "$H2" rvq8_gan_ft_speech
commit_artifacts "QUALITY_r04: tuned GAN fine-tune of the speech flagship + snapshot"

# 3. from-scratch GAN at matched wall-clock
run_phase "$(hours_to_timeout "$H3")" /tmp/r04_p3.log \
    python -u tools/quality_r04.py --dtype bfloat16 \
        --hours-per-config "$H3" rvq8_gan_speech
commit_artifacts "QUALITY_r04: from-scratch tuned GAN at matched wall-clock + snapshot"

# 4. energy bottleneck as a real codec
run_phase "$(hours_to_timeout "$H4")" /tmp/r04_p4.log \
    python -u tools/quality_r04.py --dtype bfloat16 \
        --hours-per-config "$H4" energy_rvq_speech
commit_artifacts "QUALITY_r04: energy_rvq bottleneck (coded energy transformer) + snapshot"

# 5. markdown + headline bench
timeout 600 python tools/quality_r04.py --markdown > /tmp/r04_md.log 2>&1
run_phase 2400 /tmp/r04_bench.log python -u bench.py
commit_artifacts "QUALITY_r04: campaign markdown"

echo "r04 queue done at $(date)"
