#!/bin/bash
# Round-5 post-chain evidence run.  Waits for the chain orchestrator to
# exit, then — serially, the host has one core and the chip wants
# exclusivity for clean numbers — collects everything VERDICT r4 still
# wanted measured:
#   1. the one deselected slow test (2-process real-s4-step DP) with a
#      committed log (VERDICT #8's second half),
#   2. the full bench series (3x device-resident, 3x BENCH_WIRE=1,
#      multistream) on the now-idle chip (VERDICT #3/#7 + weak #3),
#   3. dove demo inference with the fresh s4 checkpoint + GIF
#      (VERDICT #6's demo artifact; reference scripts/eval_s4_demo.sh).
# Usage: bash scripts/post_chain_r5.sh <orchestrator_pid>
set -u
cd "$(dirname "$0")/.."
mkdir -p docs/perf_r5 docs/viz

PID=${1:?orchestrator pid}
while kill -0 "$PID" 2>/dev/null; do sleep 20; done
echo "=== orchestrator gone; post-chain starts ($(date -u +%H:%M:%S)) ==="

if [ ! -f train_log/chain_r4/slow_dp.done ]; then
    echo "=== 1: slow DP test ($(date -u +%H:%M:%S)) ==="
    timeout 3600 python -m pytest tests/test_multiprocess_dp.py -m slow -v \
        --durations=5 > docs/perf_r5/pytest_slow_dp.log 2>&1 \
        && touch train_log/chain_r4/slow_dp.done
    tail -2 docs/perf_r5/pytest_slow_dp.log
fi

if [ ! -f train_log/chain_r4/bench_series.done ]; then
    echo "=== 2: bench series ($(date -u +%H:%M:%S)) ==="
    bash scripts/bench_series_r5.sh && touch train_log/chain_r4/bench_series.done
fi

if [ ! -f train_log/chain_r4/demo_gif.done ]; then
    echo "=== 3: dove demo + GIF ($(date -u +%H:%M:%S)) ==="
    timeout 1800 python eval.py --demo --data-root /root/reference/demo \
        --weights weights/s4_OTVM --outdir /tmp/demo_r5 --viz \
    && timeout 600 python scripts/make_demo_gif.py \
        --frames /root/reference/demo/dove/frames \
        --alphas /tmp/demo_r5/pred/dove \
        --out docs/viz/dove_r5.gif \
    && touch train_log/chain_r4/demo_gif.done
fi

echo "=== post-chain done ($(date -u +%H:%M:%S)) ==="
