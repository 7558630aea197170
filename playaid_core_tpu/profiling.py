"""Tracing and per-stage timing.

The reference had no profiling story (tqdm + prints only; SURVEY §5).
Here it is first-class:

* :class:`StageTimer` — lightweight per-stage wall-clock accumulation for
  the frame pipelines (decode / preprocess / infer / annotate / encode);
* :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable device trace;
* :func:`annotate_stage` — ``jax.profiler.TraceAnnotation`` passthrough so
  host stages show up on the trace timeline.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict


class StageTimer:
    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name):
        start = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - start
            self.counts[name] += 1

    def add(self, name, seconds):
        self.totals[name] += seconds
        self.counts[name] += 1

    def summary(self):
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_ms": round(1000 * self.totals[name] / max(self.counts[name], 1), 3),
            }
            for name in sorted(self.totals)
        }

    def report(self):
        return json.dumps(self.summary(), indent=1)


@contextlib.contextmanager
def trace(log_dir):
    """Device + host trace via jax.profiler (view in TensorBoard /
    Perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate_stage(name):
    """Named region on the profiler timeline for host-side stages."""
    import jax

    return jax.profiler.TraceAnnotation(name)
