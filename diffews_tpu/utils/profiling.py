"""Tracing / profiling hooks.

The reference has no systematic profiling (commented-out `time.time()`
probes — SURVEY.md §5).  The rebuild exposes:

  - `trace(logdir)`: JAX/XLA profiler capture (view with xprof/tensorboard);
  - `annotate(name)`: TraceAnnotation visible in profiler timelines;
  - `StageTimer`: lightweight host-side stage timing with device sync,
    for per-stage latency breakdowns in harness logs.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            # count the stage even when its body raises — a crashing stage
            # still spent the time, and losing it skews the breakdown
            if self.sync:
                try:
                    jax.effects_barrier()
                except Exception:
                    pass
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        rows = []
        for name, tot in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            rows.append(f"{name}: {tot:.3f}s total, {tot / n * 1e3:.1f} ms/call x{n}")
        return "\n".join(rows)
