#!/bin/bash
# KeypointNeRF evaluation launcher (reference evaluate_keypointnerf.sh
# analogue; add scheduler headers as needed).
set -e
CONFIG=${1:-configs/evaluate_on_facescape.yaml}
CKPT=${2:?checkpoint dir}
OUT=${3:-outputs/eval_keypointnerf}
shift 3 || true
python scripts/create_prediction_folder.py --config "$CONFIG" --ckpt "$CKPT" --out "$OUT" --model KeypointNeRF "$@"
