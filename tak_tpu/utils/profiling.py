"""Profiling & throughput instrumentation (SURVEY.md §5.1 parity-plus).

The reference's only instrumentation is ad-hoc nps counters
(analysis/src/main.rs:139-174, tei/src/main.rs:180-196); those exist here
too (analysis REPL `nps`, TEI info lines, self-play sims/s).  This module
adds what a production TPU deployment actually uses: a trace context
around any jitted region (viewable in XProf/TensorBoard) and a rate meter
for the sims/s / env-steps/s north-star metrics.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tak_tpu_trace"):
    """Capture a device trace of the enclosed block (jax.profiler)."""
    import jax

    with jax.profiler.trace(log_dir):
        yield
    print(f"profiler trace written to {log_dir}")


class RateMeter:
    """Sliding throughput counter (sims/s, env-steps/s, examples/s)."""

    def __init__(self, name: str = "items"):
        self.name = name
        self.reset()

    def reset(self):
        self.t0 = time.perf_counter()
        self.count = 0

    def add(self, n: int) -> None:
        self.count += n

    @property
    def rate(self) -> float:
        dt = time.perf_counter() - self.t0
        return self.count / dt if dt > 0 else 0.0

    def __str__(self) -> str:
        return f"{self.rate:,.0f} {self.name}/s"
