#!/bin/bash
# Final chained phase of round 4: push the GAN-vs-control wall-clock curve to
# 180 fine-tune minutes. Waits for the stack-bench chain's anchored done
# marker (serial TPU, CLAUDE.md), then:
#   1. +90 min GAN extension of the breakthrough branch (fm50_ext90 snapshot,
#      which crossed the phase floor: SI-SDR +5.57 dB) -> fm50_ext180
#   2. matched control extension (nogan_ext90 -> nogan_ext180) ONLY if it can
#      still start before the round-end buffer (epoch 1787222000 ~= 10:30 UTC
#      2026-08-20); the control is documented-plateaued, so it is the phase a
#      wall-clock cut should drop first.
# Each phase reports + commits its own artifacts.
set -x
cd "$(dirname "$0")/.."
echo $$ > /tmp/chain_r04_ext180.pid

grace=0
while true; do
    grep -q '^r04 stack chain done' /tmp/chain_r04_stack.log 2>/dev/null && break
    pid=$(cat /tmp/chain_r04_stack.pid 2>/dev/null)
    if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; then
        grace=0
    else
        grace=$((grace + 60))
        [ "$grace" -ge 300 ] && { echo "stack chain gone without marker; proceeding"; break; }
    fi
    sleep 60
done

commit_sweep() {
    git add GANFT_SWEEP_r04.json QUALITY_r04 QUALITY_r04.md artifacts 2>/dev/null
    git diff --cached --quiet || git commit -q -m "$1"
}

if [ ! -f QUALITY_r04/sweep/fm50_ext180.json ] && \
   [ -f artifacts/ckpt/ganft_fm50_ext90.npz ]; then
    timeout 7200 python -u tools/ganft_sweep.py extend fm50 ganft_fm50_ext90 90 fm50_ext180 \
        > /tmp/r04_ext180_gan.log 2>&1
    echo "fm50_ext180 exited $? at $(date)"
    timeout 600 python tools/ganft_sweep.py report >> /tmp/r04_ext180_gan.log 2>&1
    timeout 600 python tools/quality_r04.py --markdown >> /tmp/r04_ext180_gan.log 2>&1
    commit_sweep "GANFT_SWEEP_r04: GAN branch to 180 fine-tune minutes (fm50_ext180)"
fi

if [ "$(date +%s)" -lt 1787222000 ] && \
   [ ! -f QUALITY_r04/sweep/nogan_ext180.json ] && \
   [ -f artifacts/ckpt/ganft_nogan_ext90.npz ]; then
    timeout 7200 python -u tools/ganft_sweep.py extend nogan ganft_nogan_ext90 90 nogan_ext180 \
        > /tmp/r04_ext180_nogan.log 2>&1
    echo "nogan_ext180 exited $? at $(date)"
    timeout 600 python tools/ganft_sweep.py report >> /tmp/r04_ext180_nogan.log 2>&1
    timeout 600 python tools/quality_r04.py --markdown >> /tmp/r04_ext180_nogan.log 2>&1
    commit_sweep "GANFT_SWEEP_r04: matched control to 180 fine-tune minutes (nogan_ext180)"
else
    echo "skipping control extension (deadline passed or prerequisites missing)"
fi

echo "r04 ext180 chain done at $(date)"
