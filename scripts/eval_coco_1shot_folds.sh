#!/usr/bin/env bash
# COCO-20i 1-shot eval looped over all four folds — counterpart of the
# reference's `scripts/eval_coco2014_rthres_1shot_nosample_fold.sh`.
# Usage: bash scripts/eval_coco_1shot_folds.sh <model_dir>
set -euo pipefail

MODEL_DIR=$1
for FOLD in 0 1 2 3; do
  bash "$(dirname "$0")/eval_coco_1shot.sh" "$MODEL_DIR" "$FOLD"
done
