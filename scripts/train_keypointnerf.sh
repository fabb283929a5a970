#!/bin/bash
set -e
CONFIG=${1:-configs/train_keypointnerf_facescape.yaml}
shift || true
python scripts/train.py "$CONFIG" KeypointNeRF "$@"
