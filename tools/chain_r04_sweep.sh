#!/bin/bash
# Launches the GAN-balance sweep queue once chain_r04_final lands, then
# becomes its watchdog (runs unattended even if the builder session dies —
# CLAUDE.md protocol). The sweep queue itself also waits on the same marker,
# so the ordering is safe either way; this wrapper exists because
# queue_watchdog.sh is single-instance (it kills the previous watchdog via
# /tmp/watchdog.pid) and the main campaign's watchdog must stay alive until
# the main queue's done-marker.
set -x
cd "$(dirname "$0")/.."
echo $$ > /tmp/chain_r04_sweep.pid

MIN="${1:-20}"

while ! grep -q "chain_r04_final done" /tmp/r04_chain.log 2>/dev/null; do
    sleep 120
done

setsid nohup tools/r04_sweep_queue.sh "$MIN" > /tmp/r04_sweep_queue.log 2>&1 &
sleep 30
exec tools/queue_watchdog.sh tools/r04_sweep_queue.sh /tmp/r04_sweep_queue.log "$MIN"
