#!/bin/bash
# Round-5 SECOND builder session driver.  The image was recycled again
# mid-round: the first r5 session's chain was still training and its
# wire/multistream bench legs had crashed (committed bench_series.jsonl
# carries nulls), so this session re-runs, serially (1-core host, chip
# wants exclusivity for clean numbers):
#
#   A. dryrun compile-cache re-seed (full-width s4 train + eval graphs on
#      the 8-device virtual CPU mesh) so the driver's multichip gate hits
#      a warm cache instead of a cold compile.
#   B. bench series: 3x device-resident + 3x BENCH_WIRE=1 + multistream
#      (VERDICT r4 #3/#7 + weak #3 — the numbers the first attempt lost).
#   C. training chain s1t->s1->s2->s3 (r4 recipe; E1 trimmed 4->2 because
#      its loss converges fastest — r4: 0.793->0.073 with most of the drop
#      in epoch 1; component losses logged for the s3 attribution).
#   D. s4 under the supervisor with --deadline-secs sized from
#      DEADLINE_TS (absolute epoch seconds): per-epoch checkpoints make a
#      deadline-stop a valid end state.
#   E. post: held-out quality (post_s4 tag into QUALITY_r5.json), dove
#      demo + GIF, the one slow DP test with a committed log.
#
# Usage: DEADLINE_TS=<epoch secs> bash scripts/session_r5b.sh
set -u
cd "$(dirname "$0")/.."
DATA=${DATA:-/tmp/synth_data}
DEADLINE_TS=${DEADLINE_TS:?absolute epoch-seconds deadline for stage 4}
MARK=train_log/chain_r4
mkdir -p docs/perf_r5 "$MARK" docs/viz
touch "$MARK/oracle1088.done"   # landed last session: QUALITY_r5.json oracle_parity_1088x1920
touch "$MARK/pre_s4.done"       # r4 established the pre/post-s4 delta; chip time goes to s4

log() { echo "=== $* ($(date -u +%H:%M:%S)) ==="; }

if [ ! -f "$MARK/dryrun_seed.done" ]; then
    log "A: dryrun cache seed"
    { time timeout 1800 python __graft_entry__.py dryrun 8; } \
        > docs/perf_r5/dryrun_seed.log 2>&1 && \
    { time timeout 1800 python __graft_entry__.py dryrun_eval 8; } \
        >> docs/perf_r5/dryrun_seed.log 2>&1 && \
    touch "$MARK/dryrun_seed.done"
fi

if [ ! -f "$MARK/bench_series.done" ]; then
    log "B: bench series"
    bash scripts/bench_series_r5.sh > docs/perf_r5/bench_series.log 2>&1 \
        && touch "$MARK/bench_series.done"
fi

log "C: chain s1t..s3"
B=2; SIZE=320; W=2; STALL=420
sup() { local prog=$1; shift
    python scripts/run_supervised.py --progress-file "$prog" \
        --stall-secs $STALL -- "$@"; }

if [ ! -f "$MARK/s1t.done" ]; then
    sup train_log/s1_OTVM_trimap \
        python train_s1_trimap.py --data-root "$DATA" --input-size $SIZE --bf16 \
        --epochs 3 --batch-size $B --lr 1e-4 --workers $W --stm-gn \
        --resume weights/s1_OTVM_trimap
    python scripts/s1t_gate.py train_log/s1_OTVM_trimap
    touch "$MARK/s1t.done"
fi
if [ ! -f "$MARK/s1.done" ]; then
    sup train_log/s1_OTVM_alpha \
        python train.py --stage 1 --data-root "$DATA" --input-size $SIZE --bf16 \
        --epochs 2 --batch-size $B --lr 1e-4 --workers $W --save-every 1 \
        --stm-gn --resume weights/s1_OTVM_alpha
    touch "$MARK/s1.done"
fi
if [ ! -f "$MARK/s2.done" ]; then
    sup train_log/s2_OTVM_alpha \
        python train.py --stage 2 --data-root "$DATA" --input-size $SIZE --bf16 \
        --epochs 2 --batch-size $B --lr 5e-5 --workers $W --save-every 1 \
        --stm-gn --init weights/s1_OTVM_alpha --init-trimap weights/s1_OTVM_trimap \
        --resume weights/s2_OTVM_alpha
    touch "$MARK/s2.done"
fi
if [ ! -f "$MARK/s3.done" ]; then
    sup train_log/s3_OTVM \
        python train.py --stage 3 --data-root "$DATA" --input-size $SIZE --bf16 \
        --epochs 2 --batch-size $B --lr 5e-5 --workers $W --save-every 1 \
        --stm-gn --init weights/s2_OTVM_alpha --resume weights/s3_OTVM
    touch "$MARK/s3.done"
fi

if [ ! -f "$MARK/s4.done" ]; then
    S4_BUDGET=$(( DEADLINE_TS - $(date +%s) ))
    log "D: s4 joint, budget ${S4_BUDGET}s"
    if [ "$S4_BUDGET" -gt 600 ]; then
        python scripts/run_supervised.py --progress-file train_log/s4_OTVM \
            --stall-secs $STALL --deadline-secs "$S4_BUDGET" -- \
            python train.py --stage 4 --data-root "$DATA" --input-size $SIZE --bf16 \
            --epochs 40 --batch-size $B --lr 3e-5 --workers $W --save-every 1 \
            --stm-gn --init weights/s3_OTVM --resume weights/s4_OTVM
        touch "$MARK/s4.done"
    else
        echo "s4 budget too small; skipping training"
    fi
fi

log "E: post-chain evidence"
WEIGHTS=weights/s4_OTVM
[ -d "$WEIGHTS" ] || WEIGHTS=weights/s3_OTVM
timeout 3000 python scripts/quality_check.py --out QUALITY_r5.json --trained \
    --tag post_s4 --weights "$WEIGHTS" --synth "$DATA" || true

timeout 1800 python eval.py --demo --data-root /root/reference/demo \
    --weights "$WEIGHTS" --outdir /tmp/demo_r5 --viz \
&& timeout 600 python scripts/make_demo_gif.py \
    --frames /root/reference/demo/dove/frames \
    --alphas /tmp/demo_r5/pred/dove \
    --out docs/viz/dove_r5.gif \
&& touch "$MARK/demo_gif.done"

if [ ! -f "$MARK/slow_dp.done" ]; then
    timeout 3600 python -m pytest tests/test_multiprocess_dp.py -m slow -v \
        --durations=5 > docs/perf_r5/pytest_slow_dp.log 2>&1 \
        && touch "$MARK/slow_dp.done"
    tail -2 docs/perf_r5/pytest_slow_dp.log
fi

log "session_r5b done"
