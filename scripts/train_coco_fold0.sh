#!/usr/bin/env bash
# COCO fold-0 in-context training, canonical hyperparameters (counterpart of
# scripts/train_cocofold0_4090_nocrop_lr1_nearest_fold1_7shot_ori_v3.sh:
# bs 1, grad-accum 4, res 512, 20k steps, lr 1e-5 polynomial, 7-shot max).
set -euo pipefail
export PYTHONPATH=${PYTHONPATH:-.}

BASE_CKPT=${BASE_CKPT:-weight/stable-diffusion-2-1-ref8inchannels-tag4inchannels}
DATAPATH=${DATAPATH:-FSSBench}
OUTPUT_DIR=${OUTPUT_DIR:-logs/train_coco_fold0_7shot}

python -m diffews_tpu.cli.train \
  --pretrained_model_name_or_path "$BASE_CKPT" \
  --scheduler_load_path ./scheduler_1.0_1.0 \
  --datapath "$DATAPATH" \
  --benchmark coco \
  --fold 0 \
  --nshot 7 \
  --resolution 512 \
  --train_batch_size 1 \
  --gradient_accumulation_steps 4 \
  --max_train_steps 20000 \
  --learning_rate 1e-5 \
  --lr_scheduler polynomial \
  --max_grad_norm 1 \
  --mixed_precision bf16 \
  --checkpointing_steps 2000 \
  --seed 0 \
  --output_dir "$OUTPUT_DIR"
