#!/bin/bash
# Chain-launcher: waits for the r03d queue's done-marker, then runs the
# r03e queue under its own watchdog. Detached so it survives session death.
set -u
cd "$(dirname "$0")/.."

while ! grep -q "r03d queue done" /tmp/r03d_queue.log 2>/dev/null; do
    sleep 300
done
echo "[chain $(date +%H:%M:%S)] r03d done — launching r03e" >> /tmp/queue_watchdog.log

setsid nohup tools/r03e_queue.sh > /tmp/r03e_queue.log 2>&1 &
echo $! > /tmp/r03d_queue.pid   # watchdog reads this name for the queue PID
rm -f /tmp/r03_queue_relaunch.pid

setsid nohup tools/queue_watchdog.sh tools/r03e_queue.sh /tmp/r03e_queue.log \
    >> /tmp/queue_watchdog.log 2>&1 &
echo $! > /tmp/watchdog.pid
