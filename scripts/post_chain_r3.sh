#!/bin/bash
# Post-chain TPU queue for round 3 — the VERDICT r2 items that need the
# chip once scripts/train_chain_r3.sh has released it.  Each block is
# independent and fail-isolated (|| true) so one wall doesn't block the
# rest; results land in QUALITY_r3.json / stdout JSON lines that get
# written into docs/BENCH_NOTES.md by hand.
#
# Order: quality evidence first (uses the fresh s4 checkpoint), then perf.
set -x
cd "$(dirname "$0")/.."

# 1. Oracle parity at protocol-like resolution (VERDICT r2 #5).
#    320x576 plus one min-edge-544 clip (1088 is the protocol, but the
#    torch oracle on this 1-core host is the binding constraint; 544
#    already exercises the resize/EDT growth the judge asked about).
python scripts/quality_check.py --out QUALITY_r3.json --oracle-hw 320x576,6 || true
python scripts/quality_check.py --out QUALITY_r3.json --oracle-hw 544x960,4 || true

# 2. EDT/bf16 dove deltas re-run with the new (non-degenerate) checkpoint
#    (VERDICT r2 weak #1).
python scripts/quality_check.py --out QUALITY_r3.json --edt --bf16 \
    --weights weights/s4_OTVM --synth /tmp/synth_data || true

# 3. Train-step per-op trace (VERDICT r2 #3) at the measured-best config.
PROBE_BATCH=2 PROBE_TRACE=/tmp/train_trace python scripts/train_step_probe.py || true
python scripts/trace_top_ops.py /tmp/train_trace > /tmp/train_trace_top.txt || true

# 4. B=4 conv-tiling regression probe (VERDICT r2 #10).
python scripts/b4_tiling_probe.py --size 512 --frames 8 > /tmp/b4_probe.json || true

# 5. HD pass (VERDICT r2 #7): chunked dispatch at HD + current table refresh.
python scripts/perf_sweep.py --configs hd_c1,hd_c4,hd_c8 --frames 32 > /tmp/hd_sweep.json || true

# 6. Final bench line.
python bench.py || true
