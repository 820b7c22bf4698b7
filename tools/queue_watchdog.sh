#!/bin/bash
# Auto-recovery watchdog for the serial TPU queue (CLAUDE.md wedge protocol).
#
# A wedged remote compile looks like: the phase process exists but its CPU
# time is FROZEN for >50 min (the blocked compile RPC never returns, so
# in-script deadlines cannot fire). Recovery = kill the queue script FIRST
# (so its `wait` cannot advance to the next phase and overlap a TPU compile
# with the relaunch), then the exact pinned phase process group (never
# patterns), then relaunch the queue — every phase resumes from checkpoints,
# and the persistent XLA cache makes redone compiles cheap.
#
# Also relaunches if the queue process dies without writing its done-marker
# (e.g. the probe aborted while the tunnel hiccuped). Bounded: max 4
# relaunches per watchdog process, 30-min cooldown between them.
#
# Usage: tools/queue_watchdog.sh <queue_script> <done_marker_log> [relaunch_args...]
#   e.g. tools/queue_watchdog.sh tools/r03d_queue.sh /tmp/r03d_queue.log 2.0 1.5
# The launcher must write the queue script's PID to /tmp/r03d_queue.pid.
set -u
cd "$(dirname "$0")/.."

QUEUE="$1"; DONE_LOG="$2"; shift 2
RELAUNCH_ARGS=("$@")
STATE=/tmp/queue_watchdog.state
WLOG=/tmp/queue_watchdog.log
FREEZE_S=$((50 * 60))
COOLDOWN_S=$((30 * 60))
MAX_RELAUNCH=4
RELAUNCH_N=0   # in-process counter: the budget is per watchdog run, not
               # per shared log file (old campaigns must not exhaust it)

log() { echo "[watchdog $(date +%H:%M:%S)] $*" >> "$WLOG"; }

cpu_s() {
    # total CPU seconds of the whole PROCESS GROUP led by $1. The pinned PID
    # is the timeout(1) wrapper, whose own CPU time stays ~0 forever — the
    # python child in its group burns the CPU. Monitoring only the wrapper
    # once killed a perfectly healthy 7.4k-step training run as a "wedge".
    local total=0 t d
    while read -r t; do
        [ -n "$t" ] || continue
        d=0
        case "$t" in *-*) d=${t%%-*}; t=${t#*-};; esac
        local IFS=:
        set -- $t
        if [ $# -eq 3 ]; then total=$((total + d*86400 + 10#$1*3600 + 10#$2*60 + 10#$3))
        else total=$((total + d*86400 + 10#$1*60 + 10#$2)); fi
        unset IFS
    done < <(ps -eo pgid=,time= | awk -v g="$1" '$1 == g {print $2}')
    # no processes left in the group -> caller's kill -0 check handles it
    echo "$total"
}

queue_pid() {  # the queue script's self-written PID (each *_queue.sh writes
    # `echo $$ > /tmp/<name>.pid` at startup — a launcher-side `echo $!`
    # records the setsid fork parent, which exits immediately and once made
    # this watchdog relaunch a LIVE queue into a concurrent TPU dial)
    local base; base=$(basename "$QUEUE" .sh)
    cat "/tmp/${base}.pid" 2>/dev/null || true
}

relaunch() {
    if [ "$RELAUNCH_N" -ge "$MAX_RELAUNCH" ]; then
        log "relaunch budget exhausted ($RELAUNCH_N) — stopping watchdog"
        exit 1
    fi
    RELAUNCH_N=$((RELAUNCH_N + 1))
    log "RELAUNCH #$RELAUNCH_N: $QUEUE ${RELAUNCH_ARGS[*]}"
    setsid nohup "$QUEUE" "${RELAUNCH_ARGS[@]}" > "$DONE_LOG" 2>&1 &
    # the queue script writes its own pidfile on startup (see queue_pid)
    sleep "$COOLDOWN_S"
    rm -f "$STATE"
}

# single instance: replace any previous watchdog, and start from fresh
# freeze-tracking state (a stale state file pre-ages the freeze timer)
if [ -f /tmp/watchdog.pid ]; then
    OLD=$(cat /tmp/watchdog.pid)
    [ -n "$OLD" ] && [ "$OLD" != "$$" ] && kill "$OLD" 2>/dev/null
fi
echo $$ > /tmp/watchdog.pid
rm -f "$STATE"

# Queue-specific done marker, anchored at line start. Each queue echoes
# "<name with underscores as spaces> done at <date>" when finished. The old
# substring grep ("queue done") matched the set -x TRACE of a chained
# queue's wait loop (`+ grep -q 'r04 sweep queue done' ...`), making the
# watchdog exit minutes after launch while the queue was still running.
MARKER="$(basename "$QUEUE" .sh | tr _ ' ') done"

log "watching $QUEUE qpid=$(queue_pid) (freeze ${FREEZE_S}s, marker '^$MARKER', relaunch args: ${RELAUNCH_ARGS[*]:-none})"
while true; do
    sleep 300
    if grep -q "^$MARKER" "$DONE_LOG" 2>/dev/null; then
        log "queue done — exiting"; exit 0
    fi
    PID=$(cat /tmp/gan_run.pid 2>/dev/null || true)
    QPID=$(queue_pid)
    if [ -z "$PID" ] || ! kill -0 "$PID" 2>/dev/null; then
        # phase process gone: normal between phases and during the queue's
        # short foreground steps — only act if the queue script is gone too
        if [ -z "$QPID" ] || ! kill -0 "$QPID" 2>/dev/null; then
            log "queue process gone without done-marker"
            relaunch
        fi
        rm -f "$STATE"
        continue
    fi
    NOW=$(date +%s)
    CPU=$(cpu_s "$PID") || continue
    OLD_PID=""
    [ -f "$STATE" ] && read -r OLD_PID OLD_CPU OLD_TS < "$STATE"
    if [ "$OLD_PID" != "$PID" ] || [ "${OLD_CPU:-}" != "$CPU" ]; then
        echo "$PID $CPU $NOW" > "$STATE"
        continue
    fi
    if [ $((NOW - OLD_TS)) -gt "$FREEZE_S" ]; then
        log "WEDGE: pid $PID CPU frozen at ${CPU}s for $((NOW - OLD_TS))s — killing"
        # Order matters: the queue script first (it is blocked in `wait`;
        # killing it prevents it from spawning the NEXT phase the moment the
        # wedged phase dies), THEN the phase's process group (timeout(1)
        # runs in its own group with its python child).
        [ -n "$QPID" ] && kill -9 "$QPID" 2>/dev/null
        sleep 1
        kill -9 -- "-$PID" 2>/dev/null || kill -9 "$PID" 2>/dev/null
        sleep 10
        relaunch
    fi
done
