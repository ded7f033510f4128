#!/bin/bash
# Round-5 chip bench series (VERDICT r4 #3 numbers, #7 wire mode, weak #3
# variance bound).  Runs, in order, on the real chip:
#   1. bench.py x3 back-to-back   (device-resident 512p headline + spread)
#   2. BENCH_WIRE=1 bench.py x3   (end-to-end serving protocol: uint8 H2D
#                                  per frame, reference eval.py:157 analog)
#   3. multistream_bench.py       (4 interleaved B=1 streams, wire-inclusive,
#                                  through the productized MultiStreamEvaluator)
# Each JSON line lands in docs/perf_r5/bench_series.jsonl.
set -u -o pipefail
cd "$(dirname "$0")/.."
OUT=docs/perf_r5/bench_series.jsonl
mkdir -p docs/perf_r5
: > "$OUT"

run() {  # run <label> <env...> -- cmd...
    local label=$1; shift
    echo "=== $label ($(date -u +%H:%M:%S)) ===" >&2
    local line rc
    line=$(timeout 1800 "$@" 2>/tmp/bench_leg.err | tail -1); rc=$?
    # a failed leg must still be a valid JSON line (r5 first attempt wrote
    # `"result": }` when the wire legs crashed — unparseable AND silent)
    if [ $rc -ne 0 ] || ! printf '%s' "$line" | python -c 'import json,sys; json.load(sys.stdin)' 2>/dev/null; then
        echo "{\"label\": \"$label\", \"result\": null, \"rc\": $rc, \"err\": \"$(tail -1 /tmp/bench_leg.err | tr -d '"\\' | cut -c1-160)\"}" >> "$OUT"
        echo "LEG FAILED rc=$rc: $(tail -3 /tmp/bench_leg.err)" >&2
        return
    fi
    echo "{\"label\": \"$label\", \"result\": $line}" >> "$OUT"
    echo "$line" >&2
}

for i in 1 2 3; do
    run "device_resident_$i" python bench.py
done
for i in 1 2 3; do
    run "wire_$i" env BENCH_WIRE=1 python bench.py
done
run "multistream_4x512p_wire" python scripts/multistream_bench.py

echo "bench series done -> $OUT" >&2
