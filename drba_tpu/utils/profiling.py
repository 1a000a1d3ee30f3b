"""Tracing / profiling hooks (greenfield — the reference has none, SURVEY §5).

Two layers:
  * stage timers: lightweight host-side wall-clock accounting per pipeline
    stage (decode, flow, drm+net, encode), reported at the end of a run;
  * JAX device profiler: ``device_trace`` wraps ``jax.profiler`` to dump an
    XPlane trace viewable in TensorBoard/XProf.

Note on this platform: device dispatch is async and host transfers are
relayed, so stage timers measure *dispatch + sync points*, which is what the
pipeline actually experiences.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from dataclasses import dataclass, field


@dataclass
class StageTimes:
    total: dict = field(default_factory=lambda: defaultdict(float))
    count: dict = field(default_factory=lambda: defaultdict(int))

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.total[name] += time.perf_counter() - t0
            self.count[name] += 1

    def report(self) -> str:
        lines = ["stage timings:"]
        for name in sorted(self.total, key=lambda n: -self.total[n]):
            t, c = self.total[name], self.count[name]
            lines.append(f"  {name:<16} {t:8.3f}s total  {t / max(c, 1) * 1e3:8.2f}ms avg  x{c}")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a device trace for TensorBoard (jax.profiler)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
