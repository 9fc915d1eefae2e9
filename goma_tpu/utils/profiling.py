"""Profiling / tracing utilities.

Parity: the reference's hand-rolled timers (``src/md_timer.c ut()/ust()``)
and the per-iteration assembly/solve split printed in the Newton table
(``src/mm_sol_nonlinear.c`` ``a_start/s_start``) — which NewtonResult
already carries — plus the device-level tracing the reference never had:
``trace()`` wraps ``jax.profiler`` and produces a Perfetto/TensorBoard
trace of every XLA kernel launch.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@contextlib.contextmanager
def trace(logdir: str = "/tmp/goma_tpu_trace"):
    """Device-level profiler trace (open the result in Perfetto or
    TensorBoard's profile plugin):

        with profiling.trace("/tmp/trace"):
            solver.solve(x0, params)
    """
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside a trace (jax.profiler.TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


@dataclass
class PhaseTimers:
    """Accumulating wall-clock phase timers (the ut()/asmslv analog for
    host-side driver phases).

        timers = PhaseTimers()
        with timers.phase("assembly"):
            ...
        print(timers.report())
    """

    totals: dict = field(default_factory=dict)
    counts: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = ["  phase                 total_s   calls   s/call"]
        for k in sorted(self.totals, key=lambda k: -self.totals[k]):
            t, c = self.totals[k], self.counts[k]
            lines.append(f"  {k:20s} {t:9.3f} {c:7d} {t / max(c, 1):9.4f}")
        return "\n".join(lines)
