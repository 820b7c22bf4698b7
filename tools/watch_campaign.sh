#!/bin/bash
# Wedge watchdog (CLAUDE.md remote-compile protocol): prints campaign log
# tail, process CPU time, and newest XLA-cache entry age. A wedge looks
# like: log silent + CPU TIME frozen + no new cache file for >50 min.
PID=$(cat /tmp/gan_run.pid 2>/dev/null)
echo "--- ps ---"
ps -o pid,time,stat,etime -p "$PID" 2>/dev/null || echo "process $PID GONE"
echo "--- log tail ---"
tail -4 /tmp/gan_run.log
echo "--- xla cache ---"
C=~/.cache/audio_generation_tpu/xla
if [ -d "$C" ]; then
  N=$(ls "$C" | wc -l)
  AGE=$(( $(date +%s) - $(stat -c %Y "$C"/$(ls -t "$C" | head -1) 2>/dev/null || date +%s) ))
  echo "$N entries; newest ${AGE}s old"
else
  echo "no cache dir yet"
fi
echo "--- steps ---"
tail -2 QUALITY_r03/runs/rvq8_gan_hifi/metrics.csv 2>/dev/null || echo "no metrics yet"
