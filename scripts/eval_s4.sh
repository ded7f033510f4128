#!/bin/bash
# VM108 full eval protocol — reference scripts/eval_s4.sh.
# Usage: bash scripts/eval_s4.sh [--weights weights/s4_OTVM] [extra args...]
set -e
cd "$(dirname "$0")/.."
python eval.py "$@"
