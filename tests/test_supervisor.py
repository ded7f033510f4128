"""scripts/run_supervised.py: the stall watchdog must restart silently-hung
processes (the observed axon-tunnel failure mode), propagate real crashes,
and leave healthy runs alone.  Progress = new lines matching the progress
regex; startup writes must not count (see the livelock note in the
script's docstring)."""
import os
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.smoke

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SUP = os.path.join(REPO, "scripts", "run_supervised.py")


def _run(tmp_path, child_src, *sup_args, timeout=120):
    child = tmp_path / "child.py"
    child.write_text(textwrap.dedent(child_src))
    prog = tmp_path / "progress.log"
    cmd = [sys.executable, SUP, "--progress-file", str(prog),
           "--progress-regex", "tick", "--poll-secs", "0.5", *sup_args,
           "--", sys.executable, str(child), str(prog)]
    return subprocess.run(cmd, capture_output=True, text=True, timeout=timeout)


HEALTHY = """
import sys, time
for i in range(5):
    open(sys.argv[1], 'a').write(f"tick {i}\\n")
    time.sleep(0.2)
"""

# writes once, then hangs forever (the tunnel-stall shape); on relaunch a
# marker file makes it exit cleanly — like --resume finishing the stage
STALL_THEN_OK = """
import os, sys, time
marker = sys.argv[1] + '.second'
open(sys.argv[1], 'a').write("tick\\n")
if os.path.exists(marker):
    sys.exit(0)
open(marker, 'w').write('x')
time.sleep(3600)
"""

CRASH = """
import sys
open(sys.argv[1], 'a').write("tick\\n")
sys.exit(7)
"""


def test_healthy_run_untouched(tmp_path):
    r = _run(tmp_path, HEALTHY, "--stall-secs", "5", "--grace-secs", "5")
    assert r.returncode == 0, r.stdout + r.stderr
    assert "restarting" not in r.stdout


def test_stalled_run_restarted_and_resumes(tmp_path):
    r = _run(tmp_path, STALL_THEN_OK, "--stall-secs", "2", "--grace-secs", "60",
             "--max-restarts", "2")
    assert r.returncode == 0, r.stdout + r.stderr
    assert "restarting" in r.stdout and "relaunch 1/2" in r.stdout


def test_crash_propagates_immediately(tmp_path):
    r = _run(tmp_path, CRASH, "--stall-secs", "30", "--grace-secs", "30")
    assert r.returncode == 7, r.stdout + r.stderr
    assert "restarting" not in r.stdout


GRACE = """
import sys, time
time.sleep(4)   # silent 'compile' longer than stall budget
open(sys.argv[1], 'a').write("tick\\n")
"""


def test_silent_cold_start_spared_by_grace(tmp_path):
    r = _run(tmp_path, GRACE, "--stall-secs", "1", "--grace-secs", "30")
    assert r.returncode == 0, r.stdout + r.stderr
    assert "restarting" not in r.stdout


ENDLESS = """
import sys, time
i = 0
while True:
    open(sys.argv[1], 'a').write(f"tick {i}\\n")
    i += 1
    time.sleep(0.2)
"""


def test_deadline_stops_healthy_child_with_rc0(tmp_path):
    # s4 trains "until the clock": at --deadline-secs the child is
    # terminated and the supervisor exits 0 — per-epoch checkpoints make
    # this a valid end state, not a failure to propagate
    r = _run(tmp_path, ENDLESS, "--stall-secs", "30", "--grace-secs", "30",
             "--deadline-secs", "3", timeout=60)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "deadline" in r.stdout
    assert "restarting" not in r.stdout
