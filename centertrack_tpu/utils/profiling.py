"""Profiling hooks (reference analogue: the hand-rolled stage timers in
detector.py:56-172 / trainer.py:135-166; here backed by jax.profiler
TensorBoard traces for real device timelines).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """Capture an XLA/TPU trace viewable in TensorBoard or Perfetto.
    No-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimers:
    """Running per-stage wall-clock means, printed like the reference's
    Detector timing line (tot/load/pre/net/dec/post/merge/track)."""

    def __init__(self):
        self.sums: Dict[str, float] = {}
        self.count = 0

    def update(self, stages: Dict[str, float]) -> None:
        for k, v in stages.items():
            self.sums[k] = self.sums.get(k, 0.0) + v
        self.count += 1

    def line(self) -> str:
        if not self.count:
            return ""
        return "".join(f"{k} {v / self.count:.3f}s |"
                       for k, v in self.sums.items())
