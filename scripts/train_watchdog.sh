#!/bin/bash
# Stall-tolerant training driver for flaky remote-TPU tunnels: runs
# pdg-train, kills the EXACT child pid if the log stops growing for
# STALL_S seconds (a wedged tunnel RPC blocks the process at 0% CPU
# forever), and restarts with --resume from the atomic last-epoch
# checkpoint. Exits when the configured epoch count is reached.
#
# usage: train_watchdog.sh <config.yml> <logfile> [target_epochs]
set -u
CFG=$1
LOG=$2
TARGET=${3:-200}
STALL_S=${STALL_S:-900}

while true; do
  RESUME=""
  RESULTS=$(python - "$CFG" <<'EOF'
import sys, yaml
print(yaml.safe_load(open(sys.argv[1]))["results_folder"])
EOF
)
  if [ -f "$RESULTS/weights/last_epoch_model_weights.ckpt" ]; then
    RESUME="--resume"
  elif [ -f "$RESULTS/weights/model_weights.ckpt" ]; then
    # killed in epoch 1 between the BEST save and the first LAST save:
    # the best checkpoint is valid and resumable — promote it instead of
    # wiping the run
    echo "WATCHDOG: promoting best ckpt to last (kill landed between saves)" >> "$LOG"
    cp "$RESULTS/weights/model_weights.ckpt" \
       "$RESULTS/weights/last_epoch_model_weights.ckpt"
    RESUME="--resume"
  elif [ -d "$RESULTS/weights" ]; then
    # a previous attempt died before its first checkpoint (e.g. killed
    # mid-compile): clear the partial run or the fresh-run
    # mkdir(exist_ok=False) would crash-loop
    echo "WATCHDOG: clearing checkpoint-less $RESULTS" >> "$LOG"
    rm -rf "$RESULTS"
  fi
  echo "WATCHDOG: launching (resume='$RESUME') $(date -u +%H:%M:%S)" >> "$LOG"
  python -u -m p_div_gnn_tpu.cli train --config_path "$CFG" $RESUME >> "$LOG" 2>&1 &
  PID=$!
  while kill -0 "$PID" 2>/dev/null; do
    S1=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
    sleep "$STALL_S"
    kill -0 "$PID" 2>/dev/null || break
    S2=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
    if [ "$S1" = "$S2" ]; then
      echo "WATCHDOG: no log progress in ${STALL_S}s, killing $PID $(date -u +%H:%M:%S)" >> "$LOG"
      kill -9 "$PID" 2>/dev/null
      break
    fi
  done
  wait "$PID" 2>/dev/null
  # only look at output from the LAST launch: a stale "Epoch: N / N" from
  # an earlier (e.g. diverged-and-wiped) run in the same log must not end
  # the loop early
  if awk '/WATCHDOG: launching/{buf=""} {buf=buf $0 "\n"} END{printf "%s", buf}' "$LOG" \
      | grep -q "Epoch: $TARGET / $TARGET"; then
    echo "WATCHDOG: target epoch $TARGET reached, done $(date -u +%H:%M:%S)" >> "$LOG"
    break
  fi
  sleep 5
done
