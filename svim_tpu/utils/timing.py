"""Per-stage timing and optional jax profiler traces.

New capability relative to the reference, which only logs coarse progress
(SVIM_COLLECT.py:151).  Timing (--profile) is plain untraced wall clock and
is accurate; the jax.profiler trace under <working_dir>/traces is opt-in
via --profile_trace because its host-thread instrumentation inflates
host-bound stage wall times ~3x (measured round 4) -- a traced run's logged
timings are for timeline inspection, not for wall-clock decisions.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, Optional


class StageTimer:
    """Wall-clock accounting per pipeline stage."""

    def __init__(self, enabled: bool = True, trace_dir: Optional[str] = None):
        self.enabled = enabled
        self.trace_dir = trace_dir
        self.durations: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, trace: bool = False):
        """Time a stage; `trace=True` additionally records a jax profiler
        trace (only worth it for device-heavy stages — tracing host-only
        matplotlib work multiplies its wall time)."""
        start = time.perf_counter()
        trace_ctx = contextlib.nullcontext()
        if trace and self.enabled and self.trace_dir:
            import jax
            trace_ctx = jax.profiler.trace(self.trace_dir)
        with trace_ctx:
            yield
        self.durations[name] = self.durations.get(name, 0.0) + time.perf_counter() - start

    def report(self):
        if not self.enabled or not self.durations:
            return
        total = sum(self.durations.values())
        if self.trace_dir:
            logging.info("Stage timings below include jax trace overhead "
                         "(host-bound stages inflate ~3x); rerun with "
                         "--profile alone for accurate wall clock.")
        logging.info("Stage timings (total %.2fs):", total)
        for name, duration in self.durations.items():
            logging.info("  %-10s %8.2fs  (%.1f%%)", name, duration,
                         100.0 * duration / total if total else 0.0)
