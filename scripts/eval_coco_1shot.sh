#!/usr/bin/env bash
# COCO-20i 1-shot eval with relative threshold 0.25 — canonical protocol
# (counterpart of scripts/eval_coco2014_rthres_1shot_nosample.sh).
# Usage: bash scripts/eval_coco_1shot.sh <model_dir> [fold]
set -euo pipefail
export PYTHONPATH=${PYTHONPATH:-.}

MODEL_DIR=$1
FOLD=${2:-$(basename "$MODEL_DIR" | sed -n 's/^.*_fold\([0-9]*\).*$/\1/p')}
FOLD=${FOLD:-0}
NSHOT=1
BASE_CKPT=${BASE_CKPT:-weight/stable-diffusion-2-1-ref8inchannels-tag4inchannels}
DATAPATH=${DATAPATH:-FSSBench}
OUTPUT_DIR="./logs/icl_seg_eval/$(basename "$MODEL_DIR")/rthreshold0.25_${NSHOT}shot_fold${FOLD}"

python -m diffews_tpu.cli.evaluate \
  --log-root "$OUTPUT_DIR" \
  --denoise_steps 1 \
  --checkpoint "$BASE_CKPT" \
  --unet_ckpt_path "$MODEL_DIR/unet" \
  --scheduler_load_path ./scheduler_1.0_1.0 \
  --datapath "$DATAPATH" \
  --benchmark coco \
  --img-size 512 \
  --ensemble_size 1 \
  --bsz 1 \
  --nshot $NSHOT \
  --fold "$FOLD" \
  --threshold 0 \
  --r_threshold 0.25 \
  --half_precision
