#!/bin/bash
# Stage-3: trimap trained, alpha frozen — reference scripts/train_s3.sh.
# Usage: bash scripts/train_s3.sh [--init weights/s2_OTVM_alpha] [extra args...]
set -e
cd "$(dirname "$0")/.."
python train.py --stage 3 "$@"
