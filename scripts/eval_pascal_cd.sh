#!/usr/bin/env bash
# PASCAL cross-domain (pascal_cd) 1-shot eval, r_threshold 0.25 — counterpart
# of the reference's `scripts/eval.sh` (benchmark 'pascal_cd', threshold loop
# collapsed to its only shipped value).
# Usage: bash scripts/eval_pascal_cd.sh <model_dir> [fold]
set -euo pipefail
export PYTHONPATH=${PYTHONPATH:-.}

MODEL_DIR=$1
FOLD=${2:-0}
NSHOT=1
BASE_CKPT=${BASE_CKPT:-weight/stable-diffusion-2-1-ref8inchannels-tag4inchannels}
DATAPATH=${DATAPATH:-FSSBench}
OUTPUT_DIR="./logs/icl_seg_eval/$(basename "$MODEL_DIR")/pascal_cd_rthreshold0.25_${NSHOT}shot_fold${FOLD}"

python -m diffews_tpu.cli.evaluate \
  --log-root "$OUTPUT_DIR" \
  --denoise_steps 1 \
  --checkpoint "$BASE_CKPT" \
  --unet_ckpt_path "$MODEL_DIR/unet" \
  --scheduler_load_path ./scheduler_1.0_1.0 \
  --datapath "$DATAPATH" \
  --benchmark pascal_cd \
  --img-size 512 \
  --ensemble_size 1 \
  --bsz 1 \
  --nshot $NSHOT \
  --fold "$FOLD" \
  --threshold 0 \
  --r_threshold 0.25 \
  --half_precision
