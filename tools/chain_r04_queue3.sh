#!/bin/bash
# Launches queue3 (wavelet A/B) once queue2 lands, then becomes its watchdog.
# queue3 also waits on the same marker, so ordering is safe either way; the
# queue2 watchdog exits on queue2's done-marker before this one replaces it
# (single-instance via /tmp/watchdog.pid).
set -x
cd "$(dirname "$0")/.."
echo $$ > /tmp/chain_r04_queue3.pid

while ! grep -q "r04 queue2 done" /tmp/r04_queue2.log 2>/dev/null; do
    sleep 120
done

setsid nohup tools/r04_queue3.sh > /tmp/r04_queue3.log 2>&1 &
sleep 30
exec tools/queue_watchdog.sh tools/r04_queue3.sh /tmp/r04_queue3.log
