#!/bin/bash
set -e
CONFIG=${1:-configs/train_novel_facescape.yaml}
MODEL=${2:-NOVEL}
shift 2 || true
python scripts/train.py "$CONFIG" "$MODEL" "$@"
