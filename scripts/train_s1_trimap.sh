#!/bin/bash
# STM (trimap) pretrain on DIM — reference scripts/train_s1_trimap.sh.
# Stage chaining starts from STM_weights.pth when available.
# Usage: bash scripts/train_s1_trimap.sh [--init STM_weights.pth] [extra args...]
set -e
cd "$(dirname "$0")/.."
python train_s1_trimap.py "$@"
