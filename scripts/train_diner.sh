#!/bin/bash
# DINER training launcher (reference train_diner.sh analogue; SLURM headers
# replaced by a plain shell wrapper — submit with sbatch/xmanager as needed).
set -e
CONFIG=${1:-configs/train_dtu.yaml}
shift || true
python scripts/train.py "$CONFIG" DINER --mesh "$@"
