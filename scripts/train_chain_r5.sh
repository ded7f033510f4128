#!/bin/bash
# Round-5 training continuation (VERDICT r4 #6):
#
#   * s3 DIAGNOSTIC (+2 epochs, resumed): round 4's s3 "loss rise"
#     (1.898 -> 2.072 instantaneous; running avg flat 1.95 -> 1.97) was
#     unattributable because only the total loss was logged.  train.py now
#     logs component losses (L_alpha_comp/L_lap/L_grad/L_tri) every log
#     line; this segment exists to attribute s3 behavior: if L_tri (the
#     trained part — stage 3 trains the trimap net with alpha frozen,
#     reference train.py:146-168) falls while the frozen-alpha terms
#     wobble, the "rise" was composition noise, not a recipe bug.
#     Purely diagnostic: s4 resumes from its own checkpoint either way.
#
#   * s4 CONTINUATION (+14 epochs) on a FRESH, larger synthetic set
#     (/tmp/synth_data_r5: 160 train videos, 140 DIM fgs, seed 5 — more
#     diversity than r4's 112/100/seed-0 set) — resumes weights/s4_OTVM.
#     Held-out eval stays on the ORIGINAL synth val split so post_s4_r5
#     is directly comparable to r4's post_s4 (SAD 1.24; target < 1.0).
#
#   * post: held-out quality + dove demo strip + the committed GIF.
#
# Usage: bash scripts/train_chain_r5.sh   (idempotent; .done markers)
set -e
cd "$(dirname "$0")/.."
DATA_OLD=${DATA_OLD:-/tmp/synth_data}
DATA_NEW=${DATA_NEW:-/tmp/synth_data_r5}
B=${B:-2}
SIZE=${SIZE:-320}
PREC=${PREC:---bf16}
QOUT=${QOUT:-QUALITY_r5.json}
W=${W:-2}
E3X=${E3X:-4}    # s3 total epochs incl. r4's 2 (resume => +2 here)
E4X=${E4X:-22}   # s4 total epochs incl. r4's 8 (resume => +14 here)
STALL=${STALL:-420}
MARK=train_log/chain_r5
mkdir -p "$MARK"

sup() {  # sup <progress-dir> <cmd...>
    local prog=$1; shift
    python scripts/run_supervised.py --progress-file "$prog" \
        --stall-secs "$STALL" -- "$@"
}

if [ ! -f "$MARK/s3diag.done" ]; then
    echo "=== s3 diagnostic: +2 epochs with component-loss logging ==="
    sup train_log/s3_OTVM \
        python train.py --stage 3 --data-root "$DATA_OLD" --input-size $SIZE $PREC \
        --epochs $E3X --batch-size $B --lr 5e-5 --workers $W --save-every 1 \
        --stm-gn --resume weights/s3_OTVM
    touch "$MARK/s3diag.done"
fi

if [ ! -f "$MARK/s4.done" ]; then
    echo "=== s4 continuation: +14 epochs on the r5 synth set ==="
    sup train_log/s4_OTVM \
        python train.py --stage 4 --data-root "$DATA_NEW" --input-size $SIZE $PREC \
        --epochs $E4X --batch-size $B --lr 3e-5 --workers $W --save-every 1 \
        --stm-gn --resume weights/s4_OTVM
    touch "$MARK/s4.done"
fi

if [ ! -f "$MARK/post.done" ]; then
    echo "=== held-out eval AFTER r5 s4 (same val split as r4) + dove ==="
    timeout 3000 python scripts/quality_check.py --out "$QOUT" --trained \
        --tag post_s4_r5 --weights weights/s4_OTVM --synth "$DATA_OLD" || true
    touch "$MARK/post.done"
fi

if [ ! -f "$MARK/demo.done" ]; then
    echo "=== dove demo + committed GIF ==="
    timeout 3000 python eval.py --demo --data-root /root/reference/demo \
        --weights weights/s4_OTVM --outdir /tmp/demo_r5 --viz || exit 1
    python scripts/make_demo_gif.py \
        --frames /root/reference/demo/dove/frames --alphas /tmp/demo_r5/pred/dove \
        --out docs/viz/dove_matte.gif --max-edge 240 --fps 8
    touch "$MARK/demo.done"
fi

echo "chain r5 done; checkpoints in weights/; held-out metrics in $QOUT"
