"""RAII-style stage timers feeding the inspection slots.

Reference: xrslam/src/xrslam/utility/unique_timer.h:14-57 (`make_timer`
+ `debug_timer` macro) — per-stage wall timings averaged into
inspection slots (feature_tracker.cpp:25-33). Here: a context manager
plus a running-average aggregator; `jax.block_until_ready` hooks are
the caller's job (async dispatch would otherwise under-report)."""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict

from .inspection import inspect


class _Avg:
    __slots__ = ("total", "count")

    def __init__(self):
        self.total = 0.0
        self.count = 0

    def add(self, dt: float):
        self.total += dt
        self.count += 1

    @property
    def mean(self) -> float:
        return self.total / self.count if self.count else 0.0


_aggregates: Dict[str, _Avg] = defaultdict(_Avg)


@contextmanager
def stage_timer(name: str):
    """`with stage_timer("bundle_adjustor_solve_time"): ...` — records
    the elapsed wall time and publishes the running average to the
    like-named inspection slot."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        agg = _aggregates[name]
        agg.add(dt)
        inspect(name, agg.mean)


def timings() -> Dict[str, float]:
    return {k: v.mean for k, v in _aggregates.items()}


def reset_timings() -> None:
    _aggregates.clear()
