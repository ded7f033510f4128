#!/bin/bash
# Stage-1 alpha (FBA alone, GT trimaps) on DIM — reference scripts/train_s1_alpha.sh.
# Multi-host: set JAX_COORDINATOR_ADDRESS and run one process per host
# (replaces torch.distributed.launch; devices on a host join automatically).
# Usage: bash scripts/train_s1_alpha.sh [--init FBA.pth] [extra args...]
set -e
cd "$(dirname "$0")/.."
python train.py --stage 1 "$@"
