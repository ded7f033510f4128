"""Run logging + meters + profiling hooks.

Parity with helpers.py:125-162 (AverageMeter, per-run file+console logger)
plus what the reference lacks (SURVEY §5 'tracing: none'): optional
jax.profiler trace capture around training steps.
"""
from __future__ import annotations

import logging
import os
import time
from contextlib import contextmanager
from pathlib import Path


class AverageMeter:
    """helpers.py:125-158."""

    def __init__(self):
        self.val = self.sum = self.count = self.avg = 0.0
        self.initialized = False

    def update(self, val, weight=1):
        if not self.initialized:
            self.val, self.sum, self.count = val, val * weight, weight
            self.avg = val
            self.initialized = True
        else:
            self.val = val
            self.sum += val * weight
            self.count += weight
            self.avg = self.sum / self.count


def create_logger(output_dir: str, cfg_name: str, phase: str = "train"):
    """helpers.py:136-162: <outdir>/<name>/<name>_<ts>_<phase>.log."""
    out = Path(output_dir) / cfg_name
    out.mkdir(parents=True, exist_ok=True)
    ts = time.strftime("%Y-%m-%d-%H-%M")
    log_file = out / f"{cfg_name}_{ts}_{phase}.log"
    logger = logging.getLogger(f"otvm.{cfg_name}.{phase}")
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fh = logging.FileHandler(str(log_file))
    fh.setFormatter(logging.Formatter("%(asctime)-15s %(message)s"))
    logger.addHandler(fh)
    logger.addHandler(logging.StreamHandler())
    return logger, str(out)


@contextmanager
def profile_trace(log_dir: str, enabled: bool = False):
    """jax.profiler capture around a block (view with TensorBoard/XProf)."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-step wall-clock with a sliding window ETA (the progress_bar's
    1000-iter window, helpers.py:222-274, minus the stty dependency)."""

    def __init__(self, window: int = 1000):
        self.window = window
        self.times = []
        self.last = time.perf_counter()

    def tick(self) -> float:
        now = time.perf_counter()
        dt = now - self.last
        self.last = now
        self.times.append(dt)
        if len(self.times) > self.window:
            self.times.pop(0)
        return dt

    def eta(self, remaining_steps: int) -> float:
        if not self.times:
            return float("nan")
        return remaining_steps * (sum(self.times) / len(self.times))
