#!/bin/bash
# Retry of post_chain_r4.sh item 3: the first train-step trace probe ran
# fp32/no-remat and OOM'd HBM (the chain itself trained --bf16 + remat).
# Re-run the probe with the chain's actual precision config so the trace
# reflects the production train step.  Waits for the demo queue to release
# the chip (poll by pidfile, never by pattern).
set -x
cd "$(dirname "$0")/.."

if [[ -f /tmp/demo_r4.pid ]]; then
    while kill -0 "$(cat /tmp/demo_r4.pid)" 2>/dev/null; do sleep 30; done
fi

OTVM_TRAIN_BF16=1 OTVM_REMAT=1 PROBE_BATCH=2 PROBE_TRACE=/tmp/train_trace_bf16 \
    timeout 3000 python scripts/train_step_probe.py | tee /tmp/train_step_probe_bf16.json || true
timeout 600 python scripts/trace_top_ops.py /tmp/train_trace_bf16 \
    > /tmp/train_trace_top_bf16.txt || true

touch train_log/chain_r4/trace_retry.done
