#!/bin/bash
# Overfit the synthetic fixture through the full stage chain to produce
# trained checkpoints for quality measurement (QUALITY_r2.json).  Small
# crops + few epochs: the goal is meaningfully-dropping SAD/MSE on the
# fixture, not a real model.
# Usage: bash scripts/overfit_synth.sh [DATA_ROOT] [SIZE] [EPOCHS]
set -e
cd "$(dirname "$0")/.."
DATA=${1:-/tmp/synth_data}
SIZE=${2:-192}
EPOCHS=${3:-2}
REP=${4:-60}

python scripts/make_synth_data.py "$DATA"

echo "=== s1 trimap (STM pretrain) ==="
python train_s1_trimap.py --data-root "$DATA" --input-size $SIZE \
    --epochs 1 --batch-size 2 --repeats $REP

echo "=== s1 alpha ==="
python train.py --stage 1 --data-root "$DATA" --input-size $SIZE \
    --epochs $EPOCHS --batch-size 2 --repeats $REP

echo "=== s2 (alpha trained, trimap frozen) ==="
python train.py --stage 2 --data-root "$DATA" --input-size $SIZE \
    --epochs 1 --batch-size 2 --repeats $REP \
    --init weights/s1_OTVM_alpha --init-trimap weights/s1_OTVM_trimap

echo "=== s3 (trimap trained, alpha frozen) ==="
python train.py --stage 3 --data-root "$DATA" --input-size $SIZE \
    --epochs 1 --batch-size 2 --repeats $REP --init weights/s2_OTVM_alpha

echo "=== s4 joint on VM108 fixture ==="
python train.py --stage 4 --data-root "$DATA" --input-size $SIZE \
    --epochs $EPOCHS --batch-size 2 --repeats $REP --init weights/s3_OTVM
echo "chain done; checkpoints in weights/"
