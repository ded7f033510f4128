#!/bin/bash
# Stage-2: alpha trained, trimap frozen — reference scripts/train_s2_alpha.sh.
# Usage: bash scripts/train_s2_alpha.sh [--init weights/s1_OTVM_alpha] [extra args...]
set -e
cd "$(dirname "$0")/.."
python train.py --stage 2 "$@"
