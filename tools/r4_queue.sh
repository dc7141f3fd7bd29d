#!/bin/bash
# Round-4 study queue: serialized single-chip TPU jobs, VERDICT r3 order.
#   1. yololite_n 60ep HardSynth-20 (finish the parked capacity study)
#   2. yololite_n_seg HardSynth-seg (first hard-data mask AP)
#   3. edge_n from-scratch 40ep (pretrain-Delta baseline + PTQ companion)
#   4. backbone pretrain (cls20 corpus) -> edge_n fine-tune 40ep
#   5. edge_n QAT 40ep
#   6. parity leg 2 (ours, edge_s @320 fp32) vs tools/ref_train_compare.py
# Each stage appends to its own log under runs/r4/. Stages are independent:
# a failed stage does not block the rest.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/r4 weights
Q=runs/r4

SEG_EPOCHS=${SEG_EPOCHS:-60}
YN_EPOCHS=${YN_EPOCHS:-60}

stamp() { echo "=== [$1] $(date +%T) ===" | tee -a "$Q/queue.log"; }

# QAT train-config variant
python - <<'PY'
import yaml
cfg = yaml.safe_load(open("configs/train/hardsynth_device_aug.yaml"))
cfg["training"]["qat"] = True
open("/tmp/hardsynth_qat.yaml", "w").write(yaml.safe_dump(cfg, sort_keys=False))
# fp32 parity variant of the standard recipe (matches torch CPU leg: amp off)
std = yaml.safe_load(open("configs/train/standard_train.yaml"))
std["training"]["amp"] = False
open("/tmp/parity_fp32.yaml", "w").write(yaml.safe_dump(std, sort_keys=False))
PY

if [ "${SKIP_YN:-0}" != "1" ]; then
  stamp "1: yololite_n ${YN_EPOCHS}ep hardsynth"
  tools/run_chunked_train.sh configs/models/yololite_n.yaml \
    configs/train/hardsynth_device_aug.yaml /tmp/hardsynth/data.yaml \
    "$YN_EPOCHS" 32 640 "$Q/yololite_n.log" 2400
fi

if [ "${SKIP_SEG:-0}" != "1" ]; then
  stamp "2: yololite_n_seg ${SEG_EPOCHS}ep hardsynth-seg"
  tools/run_chunked_train.sh configs/models/yololite_n_seg.yaml \
    configs/train/hardsynth_device_aug.yaml /tmp/hardsynth_seg/data.yaml \
    "$SEG_EPOCHS" 32 640 "$Q/yololite_n_seg.log" 2400
fi

if [ "${SKIP_EDGE:-0}" != "1" ]; then
  stamp "3: edge_n scratch 40ep"
  tools/run_chunked_train.sh configs/models/edge_n.yaml \
    configs/train/hardsynth_device_aug.yaml /tmp/hardsynth/data.yaml \
    40 64 640 "$Q/edge_n_scratch40.log" 2400

  stamp "4a: backbone pretrain on cls20"
  timeout 5400 python tools/pretrain_backbone.py --data /tmp/cls20 \
    --backbone mobilenetv4_conv_small_050 --epochs 60 --batch_size 256 \
    --img_size 160 --out weights/mnv4_050_cls20.ckpt \
    > "$Q/pretrain_backbone.log" 2>&1
  echo "rc=$?" >> "$Q/pretrain_backbone.log"

  stamp "4b: edge_n fine-tune from pretrained 40ep"
  timeout 7200 python tools/train.py --model configs/models/edge_n.yaml \
    --train configs/train/hardsynth_device_aug.yaml --data /tmp/hardsynth/data.yaml \
    --epochs 40 --batch_size 64 --img_size 640 \
    --pretrained_backbone weights/mnv4_050_cls20.ckpt \
    > "$Q/edge_n_pretrained40.log" 2>&1
  echo "rc=$?" >> "$Q/edge_n_pretrained40.log"

  stamp "5: edge_n QAT 40ep"
  timeout 7200 python tools/train.py --model configs/models/edge_n.yaml \
    --train /tmp/hardsynth_qat.yaml --data /tmp/hardsynth/data.yaml \
    --epochs 40 --batch_size 64 --img_size 640 \
    > "$Q/edge_n_qat40.log" 2>&1
  echo "rc=$?" >> "$Q/edge_n_qat40.log"
fi

if [ "${SKIP_PARITY:-0}" != "1" ]; then
  stamp "6: parity leg 2 ours (edge_s @320 fp32)"
  timeout 7200 python tools/train.py --model configs/models/edge_s.yaml \
    --train /tmp/parity_fp32.yaml --data /tmp/synth4/data.yaml \
    --epochs 24 --batch_size 16 --img_size 320 \
    > "$Q/ours_edge_s_320.log" 2>&1
  echo "rc=$?" >> "$Q/ours_edge_s_320.log"
fi

stamp "queue done"
