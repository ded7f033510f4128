#!/bin/bash
# A/B for the flag-hoisting hypothesis: per-frame streaming dispatch stages
# three boolean scalars per frame with jnp.asarray(bool); on the tunneled
# chip each device_put is an RPC, so the flags may cost real latency.
# The candidate (staged-once flag reuse) lives in the /tmp/hoist_wt worktree;
# baseline is the perf queue's /tmp/bench_r4_head.json from unmodified HEAD.
# Waits for the trace retry to release the chip.
set -x
cd "$(dirname "$0")/.."

if [[ -f /tmp/trace_retry.pid ]]; then
    while kill -0 "$(cat /tmp/trace_retry.pid)" 2>/dev/null; do sleep 30; done
fi

# 1. micro: what does one scalar device_put cost on this tunnel?
timeout 600 python - <<'EOF' | tee /tmp/scalar_put_micro.json
import json, time
import jax.numpy as jnp
import jax
x = jnp.asarray(False); jax.block_until_ready(x)   # init backend
n = 200
t0 = time.perf_counter()
bufs = [jnp.asarray(False) for _ in range(n)]
jax.block_until_ready(bufs)
per = (time.perf_counter() - t0) / n * 1e3
print(json.dumps({"scalar_device_put_ms": round(per, 3), "n": n}))
EOF

# 2. bench with hoisted flags (candidate)
(cd /tmp/hoist_wt && timeout 3000 python bench.py) | tee /tmp/bench_r4_hoist.json

touch train_log/chain_r4/hoist_ab.done
