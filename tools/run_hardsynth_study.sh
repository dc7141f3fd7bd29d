#!/bin/bash
# HardSynth-20 accuracy study: sequential zoo training runs on the single TPU
# chip (device-aug recipe). Results land in runs/hardsynth/<name>.log and the
# per-run dirs; summarized into BENCHMARK_TPU.md by hand.
set -u
cd "$(dirname "$0")/.."
DATA=${DATA:-/tmp/hardsynth/data.yaml}
mkdir -p runs/hardsynth

run() {
  local name=$1 model=$2 epochs=$3 batch=$4; shift 4
  echo "=== $name (epochs=$epochs batch=$batch) $(date +%T) ==="
  timeout 10800 python tools/train.py \
    --model "$model" --train configs/train/hardsynth_device_aug.yaml \
    --data "$DATA" --epochs "$epochs" --batch_size "$batch" --img_size 640 \
    "$@" > "runs/hardsynth/$name.log" 2>&1
  echo "rc=$?" >> "runs/hardsynth/$name.log"
  grep -a "Epoch $epochs/" "runs/hardsynth/$name.log" | tail -1
}

# scope fitted to the single-chip wall-clock budget: edge_m behaves like
# edge_s on synthetic suites (round-1 study) and is dropped from the queue.
# edge_n_dev completed to epoch 64 in the first pass (runs/hardsynth_edge_n_dev)
run edge_s_dev  configs/models/edge_s.yaml  60 64
run yololite_n_dev configs/models/yololite_n.yaml 40 32
echo "study done $(date +%T)"

# approx-vs-exact top-k validation on hard data (VERDICT weak #7): same model,
# same epochs, exact lax.top_k ranking.
python - <<'PY'
import yaml
cfg = yaml.safe_load(open("configs/train/hardsynth_device_aug.yaml"))
cfg["loss"]["approx_topk"] = False
open("/tmp/hardsynth_exact.yaml", "w").write(yaml.safe_dump(cfg, sort_keys=False))
PY
echo "=== edge_n_exact (epochs=40) $(date +%T) ==="
timeout 10800 python tools/train.py \
  --model configs/models/edge_n.yaml --train /tmp/hardsynth_exact.yaml \
  --data "$DATA" --epochs 40 --batch_size 64 --img_size 640 \
  > runs/hardsynth/edge_n_exact.log 2>&1
echo "rc=$?" >> runs/hardsynth/edge_n_exact.log
echo "all runs done $(date +%T)"
