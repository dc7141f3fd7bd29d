#!/bin/bash
# Chunked long-run trainer for environments where a single process can't run
# for hours (the dev-tunnel client leaks host memory; see ARCHITECTURE.md).
# Runs tools/train.py in bounded chunks and resumes each next chunk with
# --resume <last ckpt> --start_epoch <last completed epoch>, which continues
# the LR schedule / aug taper / CSV numbering (training.start_epoch).
#
# Usage:
#   tools/run_chunked_train.sh <model.yaml> <train.yaml> <data.yaml> \
#       <total_epochs> <batch> <img> <log_file> [chunk_secs=2400]
# Env: INIT_CKPT / INIT_EPOCH continue from an existing run's checkpoint.
set -u
cd "$(dirname "$0")/.."
MODEL=$1; TRAIN=$2; DATA=$3; EPOCHS=$4; BATCH=$5; IMG=$6; LOG=$7
CHUNK=${8:-2400}
RUNS_PARENT=runs/train

start=${INIT_EPOCH:-0}; ckpt=${INIT_CKPT:-}
while [ "$start" -lt "$EPOCHS" ]; do
  args=(--model "$MODEL" --train "$TRAIN" --data "$DATA"
        --epochs "$EPOCHS" --batch_size "$BATCH" --img_size "$IMG")
  if [ -n "$ckpt" ]; then
    args+=(--resume "$ckpt" --start_epoch "$start")
  fi
  echo "=== chunk from epoch $start $(date +%T) ===" >> "$LOG"
  timeout "$CHUNK" python tools/train.py "${args[@]}" >> "$LOG" 2>&1
  rc=$?
  # resolve OUR run dir from the log, not `latest` — a concurrent training
  # run re-points the symlink and the next chunk would resume from a
  # different model's checkpoint (observed r3: yololite_n chunk resumed an
  # edge_n ckpt -> ScopeParamShapeError)
  rundir=$(grep -ao "saved to [^ ]*runs/train/[0-9]*" "$LOG" | tail -1 | sed 's/^saved to //')
  [ -z "$rundir" ] && rundir=$(readlink -f "$RUNS_PARENT/latest")
  done_epoch=$(grep -a -o "Epoch [0-9]*/$EPOCHS" "$LOG" | tail -1 | grep -o "^Epoch [0-9]*" | tr -dc 0-9)
  if [ -z "$done_epoch" ]; then
    if [ "$rc" -ne 0 ] && [ "$rc" -ne 124 ]; then
      echo "=== chunk failed rc=$rc before completing an epoch; giving up ===" >> "$LOG"
      exit "$rc"
    fi
    done_epoch=$start
  fi
  if [ -f "$rundir/weights/last_model_state.ckpt" ]; then
    ckpt="$rundir/weights/last_model_state.ckpt"
  fi   # else: keep resuming from the previous chunk's checkpoint
  if [ "$rc" -eq 0 ]; then
    echo "=== run complete at epoch $done_epoch (dir $rundir) ===" >> "$LOG"
    exit 0
  fi
  if [ "$done_epoch" -le "$start" ] && [ "$rc" -ne 124 ]; then
    echo "=== no forward progress (rc=$rc, epoch $done_epoch); giving up ===" >> "$LOG"
    exit 1
  fi
  start=$done_epoch
done
echo "=== all $EPOCHS epochs done ===" >> "$LOG"
