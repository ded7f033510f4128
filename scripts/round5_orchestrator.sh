#!/bin/bash
# Round-5 session orchestrator for the recycled image (see docs/ROUND5.md):
# every phase is serialized because the host has ONE core and the phases
# are alternately CPU-bound (dryrun compile, torch oracle half) and
# chip-bound (bench, chain) — overlap just slows both and pollutes timings.
#
#   B. re-seed the dryrun compile cache (full-width s4 train + eval graphs
#      on the 8-device virtual CPU mesh) so the driver's multichip gate,
#      which now defaults to the FULL-WIDTH model, hits a warm cache
#      instead of a ~9-min cold compile.
#   C. oracle parity at the true eval-protocol resolution (min-edge 1088,
#      VERDICT r4 #5): 2 frames, exact EDT both sides.
#   D. full training chain from scratch (r4 recipe + component-loss
#      logging); pre_s4 held-out snapshot skipped (r4 established the
#      pre/post delta; the chip time goes to s4 epochs instead).
#
# Usage: bash scripts/round5_orchestrator.sh [bench_series_pid]
set -u
cd "$(dirname "$0")/.."
mkdir -p docs/perf_r5 train_log/chain_r4

BENCH_PID=${1:-}
if [ -n "$BENCH_PID" ]; then
    echo "waiting for bench series (pid $BENCH_PID) ..."
    while kill -0 "$BENCH_PID" 2>/dev/null; do sleep 10; done
fi

if [ ! -f train_log/chain_r4/dryrun_seed.done ]; then
    echo "=== B: dryrun cache seed ($(date -u +%H:%M:%S)) ==="
    { time timeout 1800 python __graft_entry__.py dryrun 8; } \
        > docs/perf_r5/dryrun_seed.log 2>&1 && \
    { time timeout 1800 python __graft_entry__.py dryrun_eval 8; } \
        >> docs/perf_r5/dryrun_seed.log 2>&1 && \
    touch train_log/chain_r4/dryrun_seed.done
fi

if [ ! -f train_log/chain_r4/oracle1088.done ]; then
    echo "=== C: oracle parity 1088x1920 ($(date -u +%H:%M:%S)) ==="
    timeout 5400 python scripts/quality_check.py --out QUALITY_r5.json \
        --oracle-hw 1088x1920,2 > docs/perf_r5/oracle_1088.log 2>&1
    rc=$?
    echo "oracle rc=$rc" >> docs/perf_r5/oracle_1088.log
    [ $rc -eq 0 ] && touch train_log/chain_r4/oracle1088.done
fi

echo "=== D: training chain ($(date -u +%H:%M:%S)) ==="
touch train_log/chain_r4/pre_s4.done   # skip pre-s4 eval: r4 covered it
QOUT=QUALITY_r5.json E1T=3 E1=3 E2=2 E3=2 E4=12 \
    bash scripts/train_chain_r4.sh /tmp/synth_data 2 \
    > train_log/chain_r5_scratch.log 2>&1
echo "orchestrator done ($(date -u +%H:%M:%S))"
