#!/bin/bash
# Round-3 training chain on the scaled synthetic dataset: the full
# s1t -> s1 -> s2 -> s3 -> s4 stage matrix (reference train.py:86-168) at
# the reference crop (320px, S=3), sized to this image's single v5e chip.
#
# From-scratch notes (the reference fine-tunes ImageNet/STM/FBA pretrained
# trunks, none of which are in this image):
#   * higher base LRs than the reference's fine-tuning 1e-5;
#   * stair decay within each stage (x0.1 at 90% of stage iters) as in
#     helpers.py:183-198.
# Batch default 2 + bf16: the measured-best per-chip configs are b=1
# (5.30 samples/s) and b=2 (5.19) — the step is HBM-bound so batch is
# free; b=2 halves gradient noise at the same wall-clock
# (docs/BENCH_NOTES.md training matrix).
#
# Held-out evidence (VERDICT r2 #1): quality_check --trained runs the
# full-res streaming eval on the held-out synth val split BEFORE s4 (with
# the s3 checkpoint) and AFTER s4, so QUALITY_r3.json shows whether joint
# training improves the eval metric.
# Usage: bash scripts/train_chain_r3.sh [DATA_ROOT] [BATCH]
set -e
cd "$(dirname "$0")/.."
DATA=${1:-/tmp/synth_data}
B=${2:-2}
SIZE=${SIZE:-320}
PREC=${PREC:---bf16}
QOUT=${QOUT:-QUALITY_r3.json}
# 1000 iters/epoch at b=2 (100 DIM pairs / 112 videos x20 repeats); epoch
# counts sized to the measured ~0.5-0.7 s/iter end-to-end rate of this
# 1-core-host + 1-chip image (docs/BENCH_NOTES.md loader section) so the
# full chain fits a working day.  --workers 2 is the measured-best loader
# thread count here.
W=${W:-2}
E1T=${E1T:-3}; E1=${E1:-4}; E2=${E2:-2}; E3=${E3:-2}; E4=${E4:-8}

echo "=== s1 trimap (STM pretrain, from scratch) ==="
python train_s1_trimap.py --data-root "$DATA" --input-size $SIZE $PREC \
    --epochs $E1T --batch-size $B --lr 1e-4 --workers $W

echo "=== s1 alpha (FBA alone, GT trimaps) ==="
python train.py --stage 1 --data-root "$DATA" --input-size $SIZE $PREC \
    --epochs $E1 --batch-size $B --lr 1e-4 --workers $W

echo "=== s2 (alpha trained, trimap frozen) ==="
python train.py --stage 2 --data-root "$DATA" --input-size $SIZE $PREC \
    --epochs $E2 --batch-size $B --lr 5e-5 --workers $W \
    --init weights/s1_OTVM_alpha --init-trimap weights/s1_OTVM_trimap

echo "=== s3 (trimap trained, alpha frozen) ==="
python train.py --stage 3 --data-root "$DATA" --input-size $SIZE $PREC \
    --epochs $E3 --batch-size $B --lr 5e-5 --workers $W \
    --init weights/s2_OTVM_alpha

echo "=== held-out eval BEFORE s4 (s3 checkpoint) ==="
python scripts/quality_check.py --out "$QOUT" --trained --tag pre_s4 \
    --weights weights/s3_OTVM --synth "$DATA" || true

echo "=== s4 joint on synthetic VM108 ==="
python train.py --stage 4 --data-root "$DATA" --input-size $SIZE $PREC \
    --epochs $E4 --batch-size $B --lr 3e-5 --workers $W \
    --init weights/s3_OTVM

echo "=== held-out eval AFTER s4 + dove ==="
python scripts/quality_check.py --out "$QOUT" --trained --tag post_s4 \
    --weights weights/s4_OTVM --synth "$DATA"

echo "chain done; checkpoints in weights/; held-out metrics in $QOUT"
