#!/bin/bash
# Round-5 queue, part 2 (after the seg study + standalone mask-AP eval).
# Stages 2-4 of tools/r5_queue.sh, restructured after the stage-1 findings:
#   - every arm of the pretrain-Delta comparison runs as ONE process (the
#     chunked driver's boundary resume was weights-only until
#     save_optimizer landed in the recipe — single runs keep both arms
#     procedure-identical);
#   - edge_s 60ep refresh dropped for wall-clock; the capacity table labels
#     init regimes per row instead (VERDICT r4 weak #5 fallback).
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/r5 weights
Q=runs/r5

stamp() { echo "=== [$1] $(date +%T) ===" | tee -a "$Q/queue.log"; }

python - <<'PY'
import yaml
cfg = yaml.safe_load(open("configs/train/hardsynth_device_aug.yaml"))
cfg["training"]["qat"] = True
open("/tmp/hardsynth_qat.yaml", "w").write(yaml.safe_dump(cfg, sort_keys=False))
PY

stamp "2: edge_n scratch 40ep (single run)"
timeout 7200 python tools/train.py --model configs/models/edge_n.yaml \
  --train configs/train/hardsynth_device_aug.yaml --data /tmp/hardsynth/data.yaml \
  --epochs 40 --batch_size 64 --img_size 640 \
  > "$Q/edge_n_scratch40.log" 2>&1
echo "rc=$?" >> "$Q/edge_n_scratch40.log"

stamp "3a: backbone pretrain on cls20"
timeout 5400 python tools/pretrain_backbone.py --data /tmp/cls20 \
  --backbone mobilenetv4_conv_small_050 --epochs 60 --batch_size 256 \
  --img_size 160 --out weights/mnv4_050_cls20.ckpt \
  > "$Q/pretrain_backbone.log" 2>&1
echo "rc=$?" >> "$Q/pretrain_backbone.log"

stamp "3b: edge_n fine-tune from pretrained 40ep (single run)"
timeout 7200 python tools/train.py --model configs/models/edge_n.yaml \
  --train configs/train/hardsynth_device_aug.yaml --data /tmp/hardsynth/data.yaml \
  --epochs 40 --batch_size 64 --img_size 640 \
  --pretrained_backbone weights/mnv4_050_cls20.ckpt \
  > "$Q/edge_n_pretrained40.log" 2>&1
echo "rc=$?" >> "$Q/edge_n_pretrained40.log"

stamp "4: edge_n QAT 40ep (single run)"
timeout 7200 python tools/train.py --model configs/models/edge_n.yaml \
  --train /tmp/hardsynth_qat.yaml --data /tmp/hardsynth/data.yaml \
  --epochs 40 --batch_size 64 --img_size 640 \
  > "$Q/edge_n_qat40.log" 2>&1
echo "rc=$?" >> "$Q/edge_n_qat40.log"

stamp "queue2 done"
