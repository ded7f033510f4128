#!/bin/bash
# Demo (one first-frame trimap) inference — reference scripts/eval_s4_demo.sh.
# Usage: bash scripts/eval_s4_demo.sh [--weights weights/s4_OTVM] [extra args...]
set -e
cd "$(dirname "$0")/.."
python eval.py --demo "$@"
