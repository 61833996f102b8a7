#!/usr/bin/env bash
# Single-process smoke run of the trainer on tiny settings (counterpart of
# scripts/debug.sh).
set -euo pipefail
export PYTHONPATH=${PYTHONPATH:-.}

python -m diffews_tpu.cli.train \
  --pretrained_model_name_or_path "${BASE_CKPT:?set BASE_CKPT}" \
  --datapath "${DATAPATH:?set DATAPATH}" \
  --benchmark coco \
  --fold 0 \
  --nshot 1 \
  --resolution 256 \
  --train_batch_size 1 \
  --gradient_accumulation_steps 1 \
  --max_train_steps 10 \
  --checkpointing_steps 10 \
  --logging_steps 1 \
  --output_dir logs/debug
