"""Tracing / profiling helpers (SURVEY.md 5: the reference has none; it
prints running losses only, train_VIGOR.py:155-157).

- trace(): context manager writing a Perfetto/XPlane trace via jax.profiler
- StepTimer: wall-clock step timing with blocking, pairs/s accounting
- hlo_cost(): XLA HLO cost analysis (flops / bytes) for a jitted fn
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in XProf/TensorBoard."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def start_server(port: int = 9999):
    """Start the profiler server for on-demand capture from XProf."""
    return jax.profiler.start_server(port)


class StepTimer:
    """Rolling step timer. Call .tick(batch_size, blocking_leaf) per step."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times = []
        self._items = []

    def tick(self, items: int, block_on: Optional[Any] = None) -> None:
        if block_on is not None:
            jax.block_until_ready(block_on)
        self._times.append(time.perf_counter())
        self._items.append(items)
        if len(self._times) > self.window + 1:
            self._times.pop(0)
            self._items.pop(0)

    @property
    def items_per_s(self) -> float:
        if len(self._times) < 2:
            return 0.0
        dt = self._times[-1] - self._times[0]
        return sum(self._items[1:]) / dt if dt > 0 else 0.0


def hlo_cost(fn: Callable, *args, **kwargs) -> Dict[str, float]:
    """FLOPs / bytes-accessed estimate of a jitted function via XLA's cost
    analysis - the per-kernel budget tool for speed-of-light comparisons."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    return {k: float(v) for k, v in analysis.items()
            if isinstance(v, (int, float))}
