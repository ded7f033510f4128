#!/bin/bash
# Final round-4 chip job: demo inference with the trained s4 checkpoint and
# the README GIF artifact (VERDICT r3 #8).  Waits for post_chain_r4.sh (the
# perf queue) to release the chip, then runs the reference demo protocol
# (eval.py:34-37 equivalent: one first-frame trimap, propagate) and composes
# [input | alpha | green-composite] into an animated GIF.
set -x
cd "$(dirname "$0")/.."

# Wait for the perf queue (if still running) — poll by pidfile, not pattern.
if [[ -f /tmp/post_chain_r4.pid ]]; then
    while kill -0 "$(cat /tmp/post_chain_r4.pid)" 2>/dev/null; do sleep 30; done
fi

timeout 3000 python eval.py --demo --data-root /root/reference/demo --weights weights/s4_OTVM \
    --outdir /tmp/demo_r4 --viz || exit 1

python scripts/make_demo_gif.py \
    --frames /root/reference/demo/dove/frames --alphas /tmp/demo_r4/pred/dove \
    --out docs/viz/dove_matte.gif --max-edge 240 --fps 8

touch train_log/chain_r4/demo.done
