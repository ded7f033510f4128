#!/bin/bash
# Post-chain TPU queue for round 4 — the perf/parity artifacts queued (and
# never run) in round 3, now sequenced to run as soon as the chain releases
# the chip.  Each block is independent and fail-isolated; stdout is the
# artifact (tee'd into /tmp and summarized into docs/BENCH_NOTES.md).
set -x
cd "$(dirname "$0")/.."

# 1. Oracle parity at protocol-like resolution (VERDICT r2 #5 / r3 #3).
timeout 3000 python scripts/quality_check.py --out QUALITY_r4.json --oracle || true
timeout 3000 python scripts/quality_check.py --out QUALITY_r4.json --oracle-hw 320x576,6 || true
timeout 5000 python scripts/quality_check.py --out QUALITY_r4.json --oracle-hw 544x960,4 || true

# 2. EDT/bf16 dove deltas with the round-4 (non-degenerate) checkpoint.
timeout 3000 python scripts/quality_check.py --out QUALITY_r4.json --edt --bf16 \
    --weights weights/s4_OTVM --synth /tmp/synth_data || true

# 3. Train-step per-op trace (VERDICT r2 #3) at the measured-best config.
PROBE_BATCH=2 PROBE_TRACE=/tmp/train_trace timeout 3000 python scripts/train_step_probe.py || true
timeout 600 python scripts/trace_top_ops.py /tmp/train_trace > /tmp/train_trace_top.txt || true

# 4. B=4 conv-tiling regression probe (VERDICT r2 #10).
timeout 3000 python scripts/b4_tiling_probe.py --size 512 --frames 8 | tee /tmp/b4_probe.json || true

# 5. HD pass (VERDICT r2 #7): chunked dispatch at HD.
timeout 5000 python scripts/perf_sweep.py --configs hd_c1,hd_c4,hd_c8 --frames 32 | tee /tmp/hd_sweep.json || true

# 6. Bench drift bisect (VERDICT r3 #7): 68.0 -> 67.6 -> 66.5 fps over
#    rounds 1-3.  Re-run the SAME bench.py at the r1/r2 code states on
#    TODAY's chip+tunnel: if old code also reads ~today's number, the drift
#    is environment (tunnel latency: the per-frame dispatch path pays one
#    RPC per frame); if old code is faster, it's a code regression to chase.
timeout 3000 python bench.py | tee /tmp/bench_r4_head.json || true
for REV in 384b953 8c3c501 8ee3765; do   # r1/r2/r3 end-of-round code states
    git worktree add /tmp/bisect_$REV $REV 2>/dev/null || true
    (cd /tmp/bisect_$REV && timeout 3000 python bench.py) \
        | tee /tmp/bench_bisect_$REV.json || true
    git worktree remove --force /tmp/bisect_$REV 2>/dev/null || true
done
