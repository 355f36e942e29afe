"""Tracing / profiling (SURVEY.md §5.1).

The reference's only observability is per-frame wall-clock statistics
collected by the example mains (vTimesTrack -> median/mean at exit,
e.g. mono_kitti.cc:≈100–120). This module adds the layer the reference
lacks:

  profiler            -- module-level StageProfiler; engine code marks
                         stages with `with profiler.span("extract"): ...`
                         (no-op unless enabled -> zero overhead in the
                         hot path by default)
  StageProfiler.report() -- per-stage count / total / mean / median /
                         p90 wall-clock breakdown
  device_trace(dir)   -- context manager around jax.profiler.trace:
                         captures an XLA device trace viewable in
                         TensorBoard / Perfetto (the TPU-native
                         equivalent of attaching perf to the C++
                         threads)
  annotate(name)      -- jax.profiler.TraceAnnotation passthrough so
                         host-side stage names show up inside the
                         device trace timeline

Enable either via `profiler.enable()` or env ORB_TPU_PROFILE=1.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator


class StageProfiler:
    """Named wall-clock span accumulator.

    Spans may nest; each span is attributed to its own name only
    (no exclusive/inclusive split — stages in this engine are
    sequential, nesting is rare)."""

    def __init__(self, enabled: bool | None = None):
        if enabled is None:
            enabled = os.environ.get("ORB_TPU_PROFILE", "") not in (
                "", "0", "false",
            )
        self.enabled = enabled
        self._samples: dict[str, list[float]] = {}

    def enable(self):
        self.enabled = True

    def disable(self):
        self.enabled = False

    def clear(self):
        self._samples.clear()

    @contextlib.contextmanager
    def span(self, name: str) -> Iterator[None]:
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._samples.setdefault(name, []).append(
                time.perf_counter() - t0
            )

    def add(self, name: str, seconds: float):
        if self.enabled:
            self._samples.setdefault(name, []).append(seconds)

    def report(self) -> dict[str, dict]:
        """{stage: {count, total_s, mean_s, median_s, p90_s}} sorted by
        total time descending."""
        out = {}
        for name, xs in self._samples.items():
            s = sorted(xs)
            n = len(s)
            out[name] = {
                "count": n,
                "total_s": sum(s),
                "mean_s": sum(s) / n,
                "median_s": s[n // 2],
                "p90_s": s[min(n - 1, int(0.9 * n))],
            }
        return dict(
            sorted(out.items(), key=lambda kv: -kv[1]["total_s"])
        )

    def format_report(self) -> str:
        rows = [
            f"{'stage':<28}{'count':>7}{'total ms':>12}{'mean ms':>10}"
            f"{'median ms':>11}{'p90 ms':>10}"
        ]
        for name, r in self.report().items():
            rows.append(
                f"{name:<28}{r['count']:>7}{r['total_s'] * 1e3:>12.1f}"
                f"{r['mean_s'] * 1e3:>10.2f}{r['median_s'] * 1e3:>11.2f}"
                f"{r['p90_s'] * 1e3:>10.2f}"
            )
        return "\n".join(rows)


#: module-level profiler the engine stages report into
profiler = StageProfiler()


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture an XLA device trace (TensorBoard `Profile` tab /
    Perfetto). Wrap a representative window, not a whole run — traces
    are large."""
    import jax

    with jax.profiler.trace(log_dir):
        yield
    print(f"device trace written to {log_dir}")


def annotate(name: str):
    """Host-side annotation that appears on the device trace timeline
    (falls back to a no-op context outside a capture)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
