#!/bin/bash
# Round-4 master runner: serialized single-chip jobs in priority order.
#   A. serving bench (VERDICT r3 weak #5) with rc=124 retry
#   B. parity leg-2 "ours" (edge_s @320 fp32) — completes weak #7
#   C. the full study queue (yololite_n 60ep, seg, scratch/pretrain/QAT)
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/r4
Q=runs/r4

echo "=== A: serving bench $(date +%T) ===" | tee -a "$Q/runner.log"
for i in 1 2 3; do
  timeout 1500 python tools/bench_serving.py --batch 128 --nbatches 30 \
    >> "$Q/serving.log" 2>&1
  rc=$?
  echo "serving attempt $i rc=$rc" >> "$Q/runner.log"
  [ $rc -eq 0 ] && break
  sleep 30
done

echo "=== B: parity ours (edge_s @320 fp32) $(date +%T) ===" | tee -a "$Q/runner.log"
SKIP_YN=1 SKIP_SEG=1 SKIP_EDGE=1 bash tools/r4_queue.sh

echo "=== C: full study queue $(date +%T) ===" | tee -a "$Q/runner.log"
SKIP_PARITY=1 bash tools/r4_queue.sh

echo "=== runner done $(date +%T) ===" | tee -a "$Q/runner.log"
