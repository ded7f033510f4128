"""Stall-watchdog for long TPU runs on a flaky tunnel (failure detection +
elastic recovery, SURVEY §5 A3 — made concrete for this image).

Round 3's chain died silently mid-stage; reproduced in round 4: the axon
tunnel connection stalls (axon-conn-read/write in wait_woken, main thread
futex-parked) and the training process blocks forever without crashing.
Checkpoints + --resume make the run interruption-proof; this supervisor
supplies the missing piece — DETECTING the stall and restarting:

  * runs the command, tailing its --progress-file (the train log);
  * if the file gains no bytes for --stall-secs, SIGTERM then SIGKILL the
    process group and relaunch the command (same argv — the trainers'
    --resume/.done logic makes relaunches continue, not repeat);
  * at most --max-restarts relaunches; nonzero exit codes propagate
    immediately (a real crash is not a stall).

Usage:
  python scripts/run_supervised.py --progress-file LOGDIR --stall-secs 600 \
      -- python train.py --stage 4 ... --resume weights/s4_OTVM
"""
from __future__ import annotations

import argparse
import glob
import os
import signal
import subprocess
import sys
import time


def _progress_stamp(path: str) -> float:
    """Max(mtime) over the file or glob/dir — robust to per-run log names."""
    if os.path.isdir(path):
        paths = glob.glob(os.path.join(path, "**"), recursive=True)
    else:
        paths = glob.glob(path) or [path]
    stamps = [os.path.getmtime(p) for p in paths if os.path.isfile(p)]
    return max(stamps, default=0.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--progress-file", required=True,
                   help="file/dir/glob whose mtime advances while healthy")
    p.add_argument("--stall-secs", type=float, default=600.0)
    p.add_argument("--grace-secs", type=float, default=1200.0,
                   help="extra allowance before the FIRST progress stamp "
                        "(cold compiles produce no log lines for a while)")
    p.add_argument("--max-restarts", type=int, default=10)
    p.add_argument("--poll-secs", type=float, default=30.0)
    p.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="-- command to run")
    args = p.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        p.error("no command given (separate with --)")

    restarts = 0
    while True:
        start = time.time()
        baseline = _progress_stamp(args.progress_file)
        # new process group so a stalled jax runtime's helper threads die too
        proc = subprocess.Popen(cmd, start_new_session=True)
        stalled = False
        while True:
            try:
                rc = proc.wait(timeout=args.poll_secs)
                break
            except subprocess.TimeoutExpired:
                pass
            stamp = _progress_stamp(args.progress_file)
            fresh = stamp > baseline
            age = time.time() - (stamp if fresh else start)
            budget = args.stall_secs if fresh else (args.stall_secs + args.grace_secs)
            if age > budget:
                print(f"[supervise] no progress for {age:.0f}s "
                      f"(budget {budget:.0f}s) — restarting", flush=True)
                stalled = True
                try:
                    os.killpg(proc.pid, signal.SIGTERM)
                    try:
                        proc.wait(timeout=30)
                    except subprocess.TimeoutExpired:
                        os.killpg(proc.pid, signal.SIGKILL)
                        proc.wait(timeout=30)
                except ProcessLookupError:
                    pass
                break
        if not stalled:
            if rc == 0:
                return
            print(f"[supervise] command exited rc={rc} — propagating", flush=True)
            sys.exit(rc)
        restarts += 1
        if restarts > args.max_restarts:
            print(f"[supervise] giving up after {restarts - 1} restarts", flush=True)
            sys.exit(3)
        print(f"[supervise] relaunch {restarts}/{args.max_restarts}", flush=True)
        time.sleep(5)


if __name__ == "__main__":
    main()
