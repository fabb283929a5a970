#!/bin/bash
# Evaluation launcher (reference evaluate_diner.sh analogue).
set -e
CONFIG=${1:?config}
CKPT=${2:?checkpoint dir}
OUT=${3:-outputs/eval}
shift 3 || true
python scripts/create_prediction_folder.py --config "$CONFIG" --ckpt "$CKPT" --out "$OUT" "$@"
