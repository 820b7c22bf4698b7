#!/bin/bash
# Launches the round-4 follow-on queue (controls + energy GAN test) once the
# adversarial-balance sweep queue lands, then becomes its watchdog (runs
# unattended even if the builder session dies — CLAUDE.md protocol). The
# queue itself also waits on the same marker, so ordering is safe either
# way; the previous watchdog exits on the sweep queue's own done-marker
# before the new one (single-instance via /tmp/watchdog.pid) replaces it.
set -x
cd "$(dirname "$0")/.."
echo $$ > /tmp/chain_r04_queue2.pid

while ! grep -q "r04 sweep queue done" /tmp/r04_sweep_queue.log 2>/dev/null; do
    sleep 120
done

setsid nohup tools/r04_queue2.sh > /tmp/r04_queue2.log 2>&1 &
sleep 30
exec tools/queue_watchdog.sh tools/r04_queue2.sh /tmp/r04_queue2.log
