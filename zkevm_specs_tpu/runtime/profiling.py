"""Tracing / profiling hooks (SURVEY.md §5: the reference has none; the new
build uses jax.profiler traces plus per-kernel counters)."""
from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Optional


class KernelStats:
    """Wall-clock + invocation counters per named kernel."""

    def __init__(self):
        self.times: Dict[str, float] = defaultdict(float)
        self.calls: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def timed(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name] += time.perf_counter() - t0
            self.calls[name] += 1

    def report(self) -> str:
        rows = sorted(self.times.items(), key=lambda kv: -kv[1])
        return json.dumps(
            [
                {"kernel": k, "seconds": round(v, 4), "calls": self.calls[k]}
                for k, v in rows
            ]
        )


STATS = KernelStats()


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/zkevm_tpu_trace"):
    """Capture an XLA/TPU profiler trace around a region (view with
    tensorboard or xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named profiler region (shows up in the xprof timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
