#!/bin/bash
# Measure the B=4 mitigation: 4 interleaved B=1 streams (independent banks,
# reusing the cached B=1 executable) vs the measured B=4 batched dispatch
# (28.5 fps aggregate, 1.6x per-stream HBM byte blowup).  Waits for the
# flag-hoist A/B to release the chip.
set -x
cd "$(dirname "$0")/.."

if [[ -f /tmp/hoist_ab.pid ]]; then
    while kill -0 "$(cat /tmp/hoist_ab.pid)" 2>/dev/null; do sleep 30; done
fi

timeout 3000 python scripts/b4_tiling_probe.py --size 512 --frames 8 \
    --batches "" --serialize 4 | tee /tmp/b4_serialize.json

touch train_log/chain_r4/serialize_probe.done
