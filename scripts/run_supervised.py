"""Stall-watchdog for long TPU runs on a flaky tunnel (failure detection +
elastic recovery, SURVEY §5 A3 — made concrete for this image).

Round 3's chain died silently mid-stage; reproduced in round 4: the axon
tunnel connection stalls (axon-conn-read/write in wait_woken, main thread
futex-parked) and the training process blocks forever without crashing.
Checkpoints + --resume make the run interruption-proof; this supervisor
supplies the missing piece — DETECTING the stall and restarting.

Progress = NEW LOG LINES MATCHING --progress-regex (default: the trainers'
iteration lines `E<d> I<d>`), not file mtimes: startup writes (config
snapshots, "resumed at ..." lines) must not count, because a cold stage
legitimately spends 10-20 min in its first XLA compile producing no
iterations — killing it mid-compile would livelock (killed compiles are
never cached).  Budgets:

  * before the first matching line: --grace-secs (cold-compile allowance);
  * after it: --stall-secs between successive matches.

SIGTERM then SIGKILL the process group on stall, relaunch the same argv (at
most --max-restarts times) — the trainers' --resume/.done logic makes
relaunches continue, not repeat.  Nonzero exits propagate immediately (a
real crash is not a stall).

Usage:
  python scripts/run_supervised.py --progress-file LOGDIR --stall-secs 420 \
      -- python train.py --stage 4 ... --resume weights/s4_OTVM
"""
from __future__ import annotations

import argparse
import glob
import os
import re
import signal
import subprocess
import sys
import time


def _progress_count(path: str, regex: re.Pattern) -> int:
    """Number of regex-matching lines across the file/dir/glob."""
    if os.path.isdir(path):
        paths = glob.glob(os.path.join(path, "**"), recursive=True)
    else:
        paths = glob.glob(path) or [path]
    n = 0
    for p in paths:
        if not os.path.isfile(p):
            continue
        try:
            with open(p, errors="replace") as f:
                for line in f:
                    if regex.search(line):
                        n += 1
        except OSError:
            pass
    return n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--progress-file", required=True,
                   help="file/dir/glob of logs to scan for progress lines")
    p.add_argument("--progress-regex", default=r"E\d+ I\d+",
                   help="lines matching this count as progress")
    p.add_argument("--stall-secs", type=float, default=420.0,
                   help="max seconds between progress lines once iterating")
    p.add_argument("--grace-secs", type=float, default=1800.0,
                   help="allowance before the FIRST progress line (cold XLA "
                        "compiles are silent for 10-20 min)")
    p.add_argument("--max-restarts", type=int, default=10)
    p.add_argument("--deadline-secs", type=float, default=0.0,
                   help="if >0: total wall budget across restarts; at the "
                        "deadline the child group is terminated and the "
                        "supervisor exits 0 (per-epoch checkpoints make a "
                        "deadline-stop a valid end state, not a failure)")
    p.add_argument("--poll-secs", type=float, default=30.0)
    p.add_argument("cmd", nargs=argparse.REMAINDER, help="-- command to run")
    args = p.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        p.error("no command given (separate with --)")
    regex = re.compile(args.progress_regex)

    def _kill_group(pid):
        try:
            os.killpg(pid, signal.SIGTERM)
            try:
                proc.wait(timeout=30)
            except subprocess.TimeoutExpired:
                os.killpg(pid, signal.SIGKILL)
                try:
                    proc.wait(timeout=30)
                except subprocess.TimeoutExpired:
                    print(f"[supervise] pid {pid} survived SIGKILL wait; "
                          "abandoning zombie", flush=True)
        except ProcessLookupError:
            pass

    t_launch = time.time()
    restarts = 0
    while True:
        start = time.time()
        baseline = _progress_count(args.progress_file, regex)
        last_progress = None            # wall time of last NEW matching line
        count = baseline
        proc = subprocess.Popen(cmd, start_new_session=True)
        stalled = False
        while True:
            try:
                rc = proc.wait(timeout=args.poll_secs)
                break
            except subprocess.TimeoutExpired:
                pass
            if args.deadline_secs > 0 and time.time() - t_launch > args.deadline_secs:
                print(f"[supervise] deadline {args.deadline_secs:.0f}s reached "
                      "— stopping child and exiting 0 (checkpoints are the "
                      "result)", flush=True)
                _kill_group(proc.pid)
                return
            now_count = _progress_count(args.progress_file, regex)
            if now_count > count:
                count = now_count
                last_progress = time.time()
            if last_progress is None:
                age, budget = time.time() - start, args.grace_secs
            else:
                age, budget = time.time() - last_progress, args.stall_secs
            if age > budget:
                print(f"[supervise] no progress for {age:.0f}s "
                      f"(budget {budget:.0f}s, {count - baseline} lines this "
                      f"attempt) — restarting", flush=True)
                stalled = True
                # unreapable children (stuck in kernel-side tunnel I/O — the
                # exact failure mode this watchdog exists for) are abandoned
                # inside _kill_group rather than crashing us (ADVICE r4)
                _kill_group(proc.pid)
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
