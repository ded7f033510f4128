#!/bin/bash
# Stage-4: joint end-to-end on VideoMatting108 — reference scripts/train_s4.sh.
# Usage: bash scripts/train_s4.sh [--init weights/s3_OTVM] [extra args...]
set -e
cd "$(dirname "$0")/.."
python train.py --stage 4 "$@"
