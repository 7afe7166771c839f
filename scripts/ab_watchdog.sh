#!/usr/bin/env bash
# Stall watchdog for the bf16 A/B sweep (scripts/ab_bf16.py).
#
# The remote-TPU tunnel occasionally wedges a dispatch/compile RPC: the
# process futex-waits forever with zero CPU progress (observed twice on
# the round-2 flagship runs — scripts/train_watchdog.sh exists for the
# same reason). This wrapper relaunches the sweep whenever its log stops
# growing for STALL_S seconds; ab_bf16.py resumes finished/partial runs
# from its incremental JSON + per-run checkpoints, so restarts only cost
# the wedged step.
#
# Usage: scripts/ab_watchdog.sh [logfile] [stall_seconds]
set -u
LOG="${1:-/root/ab_bf16_r4.log}"
STALL_S="${2:-720}"
cd "$(dirname "$0")/.."

while true; do
  python -u scripts/ab_bf16.py >> "$LOG" 2>&1 &
  PID=$!
  echo "[watchdog] ab_bf16 pid=$PID" >> "$LOG"
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    # mtime-based stall detection
    if [ -f "$LOG" ]; then
      AGE=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
      if [ "$AGE" -gt "$STALL_S" ]; then
        echo "[watchdog] log stale ${AGE}s — killing $PID" >> "$LOG"
        kill "$PID" 2>/dev/null
        sleep 5
        kill -9 "$PID" 2>/dev/null
        break
      fi
    fi
  done
  wait "$PID" 2>/dev/null
  RC=$?
  if [ "$RC" -eq 0 ]; then
    echo "[watchdog] sweep completed rc=0" >> "$LOG"
    break
  fi
  echo "[watchdog] sweep exited rc=$RC — restarting in 10s" >> "$LOG"
  sleep 10
done
