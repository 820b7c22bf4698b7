#!/bin/bash
# Launches queue4 (GAN-vs-control curve extensions) once queue3 lands, then
# becomes its watchdog. queue4 also waits on the same marker, so ordering is
# safe either way; the queue3 watchdog exits on queue3's done-marker before
# this one replaces it (single-instance via /tmp/watchdog.pid).
set -x
cd "$(dirname "$0")/.."
echo $$ > /tmp/chain_r04_queue4.pid

while ! grep -q "^r04 queue3 done" /tmp/r04_queue3.log 2>/dev/null; do
    sleep 120
done

setsid nohup tools/r04_queue4.sh > /tmp/r04_queue4.log 2>&1 &
sleep 30
exec tools/queue_watchdog.sh tools/r04_queue4.sh /tmp/r04_queue4.log
