#!/bin/bash
# Round-4 training chain: s1t -> s1 -> s2 -> s3 -> s4 on the synthetic
# dataset, engineered around round 3's failure modes (VERDICT r3):
#
#   * GN STM trunk (--stm-gn): frozen BN at random init is the identity,
#     and the round-3 s1t never learned (CE 0.655->0.693, IoU flat ~26
#     over 350 iters).  GroupNorm actually normalizes from scratch.
#   * LEARNING GATE after s1t (VERDICT r3 #3): the chain refuses to spend
#     the s2-s4 compile budgets unless held-in IoU ROSE during s1t.
#   * interruption-proof (VERDICT r3 weak #1): per-epoch checkpoints
#     (--save-every 1), .done stage markers, and --resume on relaunch —
#     rerunning this script continues where the previous run stopped.
#   * per-stage quality snapshots (pre/post s4) land in QUALITY_r4.json.
#
# Stage semantics and LR recipe: reference train.py:86-168 + from-scratch
# notes in train_chain_r3.sh.
# Usage: bash scripts/train_chain_r4.sh [DATA_ROOT] [BATCH]   (idempotent)
set -e
cd "$(dirname "$0")/.."
DATA=${1:-/tmp/synth_data}
B=${2:-2}
SIZE=${SIZE:-320}
PREC=${PREC:---bf16}
QOUT=${QOUT:-QUALITY_r4.json}
W=${W:-2}
E1T=${E1T:-3}; E1=${E1:-4}; E2=${E2:-2}; E3=${E3:-2}; E4=${E4:-8}
MARK=train_log/chain_r4
mkdir -p "$MARK"

resume_flag() {  # $1 = weights dir: resume iff a previous partial run exists
    if [ -d "weights/$1" ]; then echo "--resume weights/$1"; fi
}

if [ ! -f "$MARK/s1t.done" ]; then
    echo "=== s1 trimap (STM pretrain, from scratch, GN trunk) ==="
    python train_s1_trimap.py --data-root "$DATA" --input-size $SIZE $PREC \
        --epochs $E1T --batch-size $B --lr 1e-4 --workers $W --stm-gn \
        $(resume_flag s1_OTVM_trimap)
    echo "=== s1t learning gate (VERDICT r3 #3) ==="
    python scripts/s1t_gate.py train_log/s1_OTVM_trimap
    touch "$MARK/s1t.done"
fi

if [ ! -f "$MARK/s1.done" ]; then
    echo "=== s1 alpha (FBA alone, GT trimaps) ==="
    python train.py --stage 1 --data-root "$DATA" --input-size $SIZE $PREC \
        --epochs $E1 --batch-size $B --lr 1e-4 --workers $W --save-every 1 \
        --stm-gn $(resume_flag s1_OTVM_alpha)
    touch "$MARK/s1.done"
fi

if [ ! -f "$MARK/s2.done" ]; then
    echo "=== s2 (alpha trained, trimap frozen) ==="
    RS=$(resume_flag s2_OTVM_alpha)
    if [ -n "$RS" ]; then INIT="$RS"; else
        INIT="--init weights/s1_OTVM_alpha --init-trimap weights/s1_OTVM_trimap"
    fi
    python train.py --stage 2 --data-root "$DATA" --input-size $SIZE $PREC \
        --epochs $E2 --batch-size $B --lr 5e-5 --workers $W --save-every 1 \
        --stm-gn $INIT
    touch "$MARK/s2.done"
fi

if [ ! -f "$MARK/s3.done" ]; then
    echo "=== s3 (trimap trained, alpha frozen) ==="
    RS=$(resume_flag s3_OTVM)
    if [ -n "$RS" ]; then INIT="$RS"; else INIT="--init weights/s2_OTVM_alpha"; fi
    python train.py --stage 3 --data-root "$DATA" --input-size $SIZE $PREC \
        --epochs $E3 --batch-size $B --lr 5e-5 --workers $W --save-every 1 \
        --stm-gn $INIT
    touch "$MARK/s3.done"
fi

if [ ! -f "$MARK/pre_s4.done" ]; then
    echo "=== held-out eval BEFORE s4 (s3 checkpoint) ==="
    python scripts/quality_check.py --out "$QOUT" --trained --tag pre_s4 \
        --weights weights/s3_OTVM --synth "$DATA" || true
    touch "$MARK/pre_s4.done"
fi

if [ ! -f "$MARK/s4.done" ]; then
    echo "=== s4 joint on synthetic VM108 ==="
    RS=$(resume_flag s4_OTVM)
    if [ -n "$RS" ]; then INIT="$RS"; else INIT="--init weights/s3_OTVM"; fi
    python train.py --stage 4 --data-root "$DATA" --input-size $SIZE $PREC \
        --epochs $E4 --batch-size $B --lr 3e-5 --workers $W --save-every 1 \
        --stm-gn $INIT
    touch "$MARK/s4.done"
fi

echo "=== held-out eval AFTER s4 + dove ==="
python scripts/quality_check.py --out "$QOUT" --trained --tag post_s4 \
    --weights weights/s4_OTVM --synth "$DATA"

echo "chain done; checkpoints in weights/; held-out metrics in $QOUT"
