"""Tracing / profiling — a first-class subsystem (SURVEY aux: the reference
has only tqdm bars + CUDA-event timing in test_perf.py; we provide jax
profiler traces and structured phase timers).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional

import jax


class PhaseTimer:
    """Accumulates wall-clock per named phase; JSONL-dumpable."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync: bool = False):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync:
                jax.effects_barrier()
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {k: {"total_s": self.totals[k], "count": self.counts[k],
                    "mean_s": self.totals[k] / max(self.counts[k], 1)}
                for k in self.totals}

    def dump(self, path: str) -> None:
        with open(path, "a") as f:
            f.write(json.dumps(self.summary()) + "\n")


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace context (view in TensorBoard / xprof)."""
    if not log_dir:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class MetricLogger:
    """Structured metric stream.  JSONL always; optional TensorBoard
    writer for parity with the reference's `--report_to` trackers
    (train/train.py:712-719, 1164-1173: tensorboard default, wandb/comet
    optional).  The TB dependency is import-guarded — missing
    `torch.utils.tensorboard` degrades to JSONL-only with a warning."""

    def __init__(self, path: str, report_to: tuple = ("jsonl",),
                 tb_dir: str = None):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path
        self._f = open(path, "a", buffering=1)
        self._tb = None
        if "tensorboard" in report_to:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(
                    tb_dir or os.path.join(os.path.dirname(path) or ".",
                                           "tensorboard"))
            except ImportError:
                import warnings
                warnings.warn("tensorboard writer unavailable "
                              "(torch.utils.tensorboard import failed); "
                              "logging JSONL only")

    def log(self, step: int, metrics: Dict) -> None:
        rec = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = str(v)
        self._f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in rec.items():
                if k not in ("step", "time") and isinstance(v, float):
                    self._tb.add_scalar(k, v, int(step))

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()
