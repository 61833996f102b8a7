#!/usr/bin/env bash
# Turnkey reference-parity runbook (BASELINE.md: fold0 mIoU within 0.3).
#
#   bash tools/verify_parity.sh <checkpoint_dir> <datapath> [ref_miou] [extra...]
#
#   checkpoint_dir  diffusers-layout SD-2.1 ref8 checkpoint
#                   (reference: weight/stable-diffusion-2-1-ref8inchannels-...)
#   datapath        FSSBench root (cli/prepare.py builds it from raw downloads)
#   ref_miou        the reference run's mIoU on the same protocol (optional:
#                   omit to record ours for later comparison)
#
# Everything else (golden generation, the seeded fold0 1000-episode
# protocol, the verdict) is python -m diffews_tpu.cli.verify_parity — see
# its --help for trained-unet / scheduler / fold / nshot overrides.
set -euo pipefail
cd "$(dirname "$0")/.."

CKPT=${1:?usage: verify_parity.sh <checkpoint_dir> <datapath> [ref_miou] [extra...]}
DATA=${2:?need datapath}
shift 2
REF_ARGS=()
if [[ $# -gt 0 && $1 =~ ^[0-9.]+$ ]]; then
  REF_ARGS=(--ref_miou "$1")
  shift
fi

exec python -m diffews_tpu.cli.verify_parity \
  --checkpoint "$CKPT" --datapath "$DATA" "${REF_ARGS[@]}" "$@"
