"""scripts/s1t_gate.py: the chain's learning gate must pass rising-IoU logs
and fail flat ones (the round-3 failure mode it exists to catch)."""
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.smoke

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GATE = os.path.join(REPO, "scripts", "s1t_gate.py")


def _write_log(tmp_path, ious):
    d = tmp_path / "s1_OTVM_trimap"
    d.mkdir()
    lines = [
        f"2026-08-19 02:00:00,000 E0 I{i * 50} CE 0.5000 (0.5000) "
        f"IoU {v:.2f} ({v:.2f})" for i, v in enumerate(ious)
    ]
    (d / "s1_OTVM_trimap_x_train.log").write_text("\n".join(lines) + "\n")
    return str(d)


def _run(run_dir):
    return subprocess.run([sys.executable, GATE, run_dir],
                          capture_output=True, text=True)


def test_rising_iou_passes(tmp_path):
    r = _run(_write_log(tmp_path, [25, 28, 33, 40, 48, 55, 60, 62]))
    assert r.returncode == 0, r.stdout + r.stderr
    assert "PASS" in r.stdout


def test_flat_iou_fails(tmp_path):
    # the round-3 shape: flat ~26 the whole way
    r = _run(_write_log(tmp_path, [26, 26.5, 25.8, 26.2, 26.1, 25.9, 26.0, 26.3]))
    assert r.returncode == 1, r.stdout + r.stderr
    assert "FAIL" in r.stdout


def test_too_few_points_fails_safe(tmp_path):
    r = _run(_write_log(tmp_path, [26, 30]))
    assert r.returncode == 2, r.stdout + r.stderr
