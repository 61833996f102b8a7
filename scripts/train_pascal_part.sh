#!/usr/bin/env bash
# Pascal-Part n-shot training — counterpart of the reference's
# `scripts/train_paco.sh` (which, despite its name, trains on benchmark
# 'pascal_part'; bs 1, grad-accum 4, res 512, 20k steps, lr 1e-5).
set -euo pipefail
export PYTHONPATH=${PYTHONPATH:-.}

BASE_CKPT=${BASE_CKPT:-weight/stable-diffusion-2-1-ref8inchannels-tag4inchannels}
DATAPATH=${DATAPATH:-FSSBench}
OUTPUT_DIR=${OUTPUT_DIR:-logs/train_pascal_part}

python -m diffews_tpu.cli.train \
  --pretrained_model_name_or_path "$BASE_CKPT" \
  --scheduler_load_path ./scheduler_1.0_1.0 \
  --datapath "$DATAPATH" \
  --benchmark pascal_part \
  --fold 0 \
  --nshot 5 \
  --resolution 512 \
  --train_batch_size 1 \
  --gradient_accumulation_steps 4 \
  --max_train_steps 20000 \
  --learning_rate 1e-5 \
  --lr_scheduler polynomial \
  --mixed_precision bf16 \
  --checkpointing_steps 2000 \
  --seed 0 \
  --output_dir "$OUTPUT_DIR"
