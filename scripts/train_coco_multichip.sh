#!/usr/bin/env bash
# Multi-chip data-parallel COCO training — counterpart of the reference's
# `scripts/coco_multigpu.sh` (2-process DDP, bs 2/device, grad-accum 4,
# effective batch 16). On TPU the parallelism is a `jax.sharding.Mesh` data
# axis inside one process (`--num_data_shards`), not an accelerate/NCCL
# process group; XLA inserts the gradient psum over ICI.
set -euo pipefail
export PYTHONPATH=${PYTHONPATH:-.}

BASE_CKPT=${BASE_CKPT:-weight/stable-diffusion-2-1-ref8inchannels-tag4inchannels}
DATAPATH=${DATAPATH:-FSSBench}
NUM_CHIPS=${NUM_CHIPS:-2}   # 0 = all visible devices
PER_CHIP_BS=${PER_CHIP_BS:-2}
OUTPUT_DIR=${OUTPUT_DIR:-logs/train_coco_fold0_multichip}

python -m diffews_tpu.cli.train \
  --pretrained_model_name_or_path "$BASE_CKPT" \
  --scheduler_load_path ./scheduler_1.0_1.0 \
  --datapath "$DATAPATH" \
  --benchmark coco \
  --fold 0 \
  --nshot 1 \
  --resolution 512 \
  --train_batch_size $((NUM_CHIPS * PER_CHIP_BS)) \
  --num_data_shards "$NUM_CHIPS" \
  --gradient_accumulation_steps 4 \
  --max_train_steps 20000 \
  --learning_rate 1e-5 \
  --lr_scheduler polynomial \
  --max_grad_norm 1 \
  --mixed_precision bf16 \
  --checkpointing_steps 2000 \
  --seed 0 \
  --output_dir "$OUTPUT_DIR"
