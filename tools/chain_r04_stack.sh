#!/bin/bash
# Chained phase: TPU A/B bench of the fused residual-stack Pallas kernel
# (tools/bench_stack.py), launched only after the r04 resume queue prints its
# anchored done-marker (never overlap remote TPU compiles, CLAUDE.md).
# Fallback: if the resume queue's pid dies without the marker (crash), wait a
# 5-minute grace for a watchdog relaunch, then proceed anyway.
set -x
cd "$(dirname "$0")/.."
echo $$ > /tmp/chain_r04_stack.pid

grace=0
while true; do
    grep -q '^r04 resume done' /tmp/r04_resume.log 2>/dev/null && break
    pid=$(cat /tmp/r04_resume.pid 2>/dev/null)
    if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; then
        grace=0
    else
        grace=$((grace + 60))
        [ "$grace" -ge 300 ] && { echo "resume queue gone without marker; proceeding"; break; }
    fi
    sleep 60
done

timeout 3600 python -u tools/bench_stack.py > /tmp/r04_stack_bench.log 2>&1
echo "bench_stack exited $? at $(date)"
git add STACK_BENCH_r04.json 2>/dev/null
git diff --cached --quiet || git commit -q -m "STACK_BENCH_r04: TPU A/B of the fused residual-stack Pallas kernel vs XLA"

echo "r04 stack chain done at $(date)"
