#!/bin/bash
# Round-5 study queue: serialized single-chip TPU jobs, VERDICT r4 order.
#   1. yololite_n_seg 60ep HardSynth-seg (first hard-data mask AP)   [V#2]
#   2. edge_n from-scratch 40ep (pretrain-Delta baseline, post-init-fix
#      refresh of the capacity table)                                [V#3,#5w]
#   3. backbone pretrain (cls20 corpus) -> edge_n fine-tune 40ep     [V#3]
#   4. edge_n QAT 40ep (-> eval --quantize int8 vs PTQ vs bf16)      [V#4]
#   5. edge_s refresh 60ep with torch_conv_init (one init regime
#      across the HardSynth capacity table)                          [V weak#5]
# Each stage appends to its own log under runs/r5/. Stages are independent:
# a failed stage does not block the rest.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/r5 weights
Q=runs/r5

stamp() { echo "=== [$1] $(date +%T) ===" | tee -a "$Q/queue.log"; }

# QAT train-config variant
python - <<'PY'
import yaml
cfg = yaml.safe_load(open("configs/train/hardsynth_device_aug.yaml"))
cfg["training"]["qat"] = True
open("/tmp/hardsynth_qat.yaml", "w").write(yaml.safe_dump(cfg, sort_keys=False))
PY

if [ "${SKIP_BENCH:-0}" != "1" ]; then
  stamp "0a: serving bench regen (fixed ceiling leg)"
  timeout 1800 python tools/bench_serving.py > "$Q/serving.log" 2>&1
  echo "rc=$?" >> "$Q/serving.log"

  stamp "0b: train-step attribution profile"
  timeout 2700 python tools/profile_train_step.py 64 640 200 \
    > "$Q/profile_train_step.log" 2>&1
  echo "rc=$?" >> "$Q/profile_train_step.log"

  stamp "0c: config matrix re-measure (const-weights + chip leg)"
  timeout 5400 python tools/bench_matrix.py > "$Q/bench_matrix.log" 2>&1
  echo "rc=$?" >> "$Q/bench_matrix.log"
fi

if [ "${SKIP_SEG:-0}" != "1" ]; then
  stamp "1: yololite_n_seg ${SEG_EPOCHS:-60}ep hardsynth-seg"
  tools/run_chunked_train.sh configs/models/yololite_n_seg.yaml \
    configs/train/hardsynth_device_aug.yaml /tmp/hardsynth_seg/data.yaml \
    "${SEG_EPOCHS:-60}" 32 640 "$Q/yololite_n_seg.log" 2400
fi

if [ "${SKIP_SCRATCH:-0}" != "1" ]; then
  stamp "2: edge_n scratch 40ep"
  tools/run_chunked_train.sh configs/models/edge_n.yaml \
    configs/train/hardsynth_device_aug.yaml /tmp/hardsynth/data.yaml \
    40 64 640 "$Q/edge_n_scratch40.log" 2400
fi

if [ "${SKIP_PRETRAIN:-0}" != "1" ]; then
  stamp "3a: backbone pretrain on cls20"
  timeout 5400 python tools/pretrain_backbone.py --data /tmp/cls20 \
    --backbone mobilenetv4_conv_small_050 --epochs 60 --batch_size 256 \
    --img_size 160 --out weights/mnv4_050_cls20.ckpt \
    > "$Q/pretrain_backbone.log" 2>&1
  echo "rc=$?" >> "$Q/pretrain_backbone.log"

  stamp "3b: edge_n fine-tune from pretrained 40ep"
  timeout 7200 python tools/train.py --model configs/models/edge_n.yaml \
    --train configs/train/hardsynth_device_aug.yaml --data /tmp/hardsynth/data.yaml \
    --epochs 40 --batch_size 64 --img_size 640 \
    --pretrained_backbone weights/mnv4_050_cls20.ckpt \
    > "$Q/edge_n_pretrained40.log" 2>&1
  echo "rc=$?" >> "$Q/edge_n_pretrained40.log"
fi

if [ "${SKIP_QAT:-0}" != "1" ]; then
  stamp "4: edge_n QAT 40ep"
  timeout 7200 python tools/train.py --model configs/models/edge_n.yaml \
    --train /tmp/hardsynth_qat.yaml --data /tmp/hardsynth/data.yaml \
    --epochs 40 --batch_size 64 --img_size 640 \
    > "$Q/edge_n_qat40.log" 2>&1
  echo "rc=$?" >> "$Q/edge_n_qat40.log"
fi

if [ "${SKIP_EDGES:-0}" != "1" ]; then
  stamp "5: edge_s refresh 60ep (torch_conv_init regime)"
  tools/run_chunked_train.sh configs/models/edge_s.yaml \
    configs/train/hardsynth_device_aug.yaml /tmp/hardsynth/data.yaml \
    60 64 640 "$Q/edge_s_refresh60.log" 2400
fi

stamp "queue done"
