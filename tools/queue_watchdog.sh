#!/bin/bash
# Auto-recovery watchdog for the serial TPU queue (CLAUDE.md wedge protocol).
#
# A wedged remote compile looks like: the phase process exists but its CPU
# time is FROZEN for >50 min (the blocked compile RPC never returns, so
# in-script deadlines cannot fire). Recovery = kill the exact pinned PIDs
# (never pkill by pattern) and relaunch the queue script — every phase
# resumes from checkpoints, and the persistent XLA cache makes redone
# compiles cheap.
#
# Also relaunches if the queue process dies without writing its done-marker
# (e.g. the probe aborted while the tunnel hiccuped). Bounded: max 4
# relaunches, 30-min cooldown between them.
#
# Usage: tools/queue_watchdog.sh <queue_script> <done_marker_log> [relaunch_args...]
#   e.g. tools/queue_watchdog.sh tools/r03d_queue.sh /tmp/r03d_queue.log 2.0 1.5
set -u
cd "$(dirname "$0")/.."

QUEUE="$1"; DONE_LOG="$2"; shift 2
RELAUNCH_ARGS=("$@")
STATE=/tmp/queue_watchdog.state
WLOG=/tmp/queue_watchdog.log
FREEZE_S=$((50 * 60))
COOLDOWN_S=$((30 * 60))
MAX_RELAUNCH=4

log() { echo "[watchdog $(date +%H:%M:%S)] $*" >> "$WLOG"; }

cpu_s() {  # total CPU seconds of a PID ([DD-]HH:MM:SS or MM:SS)
    local t
    t=$(ps -o time= -p "$1" 2>/dev/null | tr -d ' ') || return 1
    [ -n "$t" ] || return 1
    local d=0
    case "$t" in *-*) d=${t%%-*}; t=${t#*-};; esac
    local IFS=:
    set -- $t
    if [ $# -eq 3 ]; then echo $((d*86400 + $1*3600 + $2*60 + $3))
    else echo $((d*86400 + $1*60 + $2)); fi
}

relaunch() {
    local n
    n=$(grep -c RELAUNCH "$WLOG" 2>/dev/null); n=${n:-0}
    if [ "$n" -ge "$MAX_RELAUNCH" ]; then
        log "relaunch budget exhausted ($n) — stopping watchdog"; exit 1
    fi
    log "RELAUNCH #$((n+1)): $QUEUE ${RELAUNCH_ARGS[*]}"
    setsid nohup "$QUEUE" "${RELAUNCH_ARGS[@]}" > "$DONE_LOG" 2>&1 &
    echo $! > /tmp/r03_queue_relaunch.pid
    sleep "$COOLDOWN_S"
    rm -f "$STATE"
}

log "watching $QUEUE (freeze ${FREEZE_S}s, relaunch args: ${RELAUNCH_ARGS[*]:-none})"
while true; do
    sleep 300
    if grep -q "queue done" "$DONE_LOG" 2>/dev/null; then
        log "queue done — exiting"; exit 0
    fi
    PID=$(cat /tmp/gan_run.pid 2>/dev/null || true)
    QPID=$(cat /tmp/r03_queue_relaunch.pid 2>/dev/null \
        || cat /tmp/r03d_queue.pid 2>/dev/null || true)
    if [ -z "$PID" ] || ! kill -0 "$PID" 2>/dev/null; then
        # phase process gone: normal between phases — only act if the whole
        # queue script is gone too
        if [ -z "$QPID" ] || ! kill -0 "$QPID" 2>/dev/null; then
            log "queue process gone without done-marker"
            relaunch
        fi
        rm -f "$STATE"
        continue
    fi
    NOW=$(date +%s)
    CPU=$(cpu_s "$PID") || continue
    read -r OLD_PID OLD_CPU OLD_TS < "$STATE" 2>/dev/null || OLD_PID=""
    if [ "$OLD_PID" != "$PID" ] || [ "${OLD_CPU:-}" != "$CPU" ]; then
        echo "$PID $CPU $NOW" > "$STATE"
        continue
    fi
    if [ $((NOW - OLD_TS)) -gt "$FREEZE_S" ]; then
        log "WEDGE: pid $PID CPU frozen at ${CPU}s for $((NOW - OLD_TS))s — killing"
        # timeout(1) runs in its own process group with its python child —
        # kill that exact group (never patterns), then the queue script
        kill -9 -- "-$PID" 2>/dev/null || kill -9 "$PID" 2>/dev/null
        [ -n "$QPID" ] && kill -9 "$QPID" 2>/dev/null
        sleep 10
        relaunch
    fi
done
