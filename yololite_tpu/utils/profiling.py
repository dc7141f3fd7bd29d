"""Profiling utilities.

The reference only has manual wall-clock timing (SURVEY.md §5: per-stage
timers, CUDA-synchronized forward bench). The TPU build keeps those reports
(tools/bench_latency.py) and adds a first-class `jax.profiler` trace option:
the captured trace opens in TensorBoard/Perfetto and shows per-HLO timing,
HBM traffic and MXU utilization.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace into <log_dir>/profile (no-op if None)."""
    if not log_dir:
        yield
        return
    import jax
    out = os.path.join(log_dir, "profile")
    os.makedirs(out, exist_ok=True)
    jax.profiler.start_trace(out)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulates wall-clock per named stage; reports mean/p50/p90/p95."""

    def __init__(self):
        self.samples = {}

    @contextlib.contextmanager
    def time(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples.setdefault(name, []).append(
                (time.perf_counter() - t0) * 1e3)

    def report(self):
        import numpy as np
        out = {}
        for k, v in self.samples.items():
            a = np.asarray(v)
            out[k] = {"mean_ms": float(a.mean()), "p50_ms": float(np.percentile(a, 50)),
                      "p90_ms": float(np.percentile(a, 90)),
                      "p95_ms": float(np.percentile(a, 95)), "n": len(v)}
        return out
