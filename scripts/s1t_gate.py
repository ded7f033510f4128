"""Learning gate for the stage-1 trimap pretrain (VERDICT r3 #3).

Round 3 spent the s2-s4 compile budgets on top of an s1t whose IoU never
moved (flat ~26 for 350 iters).  This gate parses the s1t train log and
exits nonzero unless the in-training trimap IoU ROSE materially from the
start of training to the end, stopping the chain while the problem is
still cheap to diagnose.

Usage: python scripts/s1t_gate.py train_log/s1_OTVM_trimap [--min-gain 5]
Log lines look like:  E0 I50 CE 0.6,.. (..) IoU 26.31 (26.31)
(the parenthesised value is the running average; the bare one the batch).
"""
from __future__ import annotations

import argparse
import glob
import os
import re
import sys

LINE = re.compile(r"E(\d+) I(\d+) CE ([\d.]+) \(([\d.]+)\) IoU ([\d.]+) \(([\d.]+)\)")


def parse_log(run_dir: str):
    logs = sorted(glob.glob(os.path.join(run_dir, "*", "*_train.log")) +
                  glob.glob(os.path.join(run_dir, "*_train.log")))
    points = []  # (epoch, iter, batch_iou)
    for lp in logs:
        with open(lp) as f:
            for line in f:
                m = LINE.search(line)
                if m:
                    points.append((int(m.group(1)), int(m.group(2)),
                                   float(m.group(5))))
    return points


def main():
    p = argparse.ArgumentParser()
    p.add_argument("run_dir")
    p.add_argument("--min-gain", type=float, default=5.0,
                   help="required IoU points of improvement (head vs tail)")
    args = p.parse_args()

    pts = parse_log(args.run_dir)
    if len(pts) < 4:
        print(f"s1t gate: only {len(pts)} log points in {args.run_dir} — "
              "not enough to judge; failing safe")
        sys.exit(2)
    ious = [x[2] for x in pts]
    k = max(2, len(ious) // 5)
    head = sum(ious[:k]) / k
    tail = sum(ious[-k:]) / k
    gain = tail - head
    verdict = "PASS" if gain >= args.min_gain else "FAIL"
    print(f"s1t gate: IoU head {head:.2f} -> tail {tail:.2f} "
          f"(gain {gain:+.2f}, need >= {args.min_gain}) [{verdict}] "
          f"({len(ious)} points)")
    if verdict == "FAIL":
        print("s1t did not learn — fix s1t before spending s2-s4 budgets "
              "(LR sweep / --stm-gn / longer s1t; VERDICT r3 #3).")
        sys.exit(1)


if __name__ == "__main__":
    main()
