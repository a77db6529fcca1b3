"""Tracing / profiling helpers (SURVEY.md 5: the reference has none; it
prints running losses only, train_VIGOR.py:155-157).

- trace(): context manager writing a Perfetto/XPlane trace via jax.profiler
- StepTimer: wall-clock step timing with blocking, pairs/s accounting
- hlo_cost(): XLA HLO cost analysis (flops / bytes) for a jitted fn
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Any, Callable, Dict, Optional

import jax


def sync(tree) -> Any:
    """Synchronize by VALUE: device_get every leaf and return the host pytree.

    jax.block_until_ready is NOT trustworthy on every platform: on the axon
    remote TPU platform it returns before device completion for large
    multi-output executables (measured: a train step reported 8.5 ms/step by
    block_until_ready while the device trace showed 551 ms/step of real
    execution; see tools/microbench_tpu.py). Fetching values cannot lie -
    the bytes only exist once the program ran. All timing in this repo must
    synchronize through this function or sync_element, never through
    block_until_ready.

    CAUTION for timing loops: this downloads the WHOLE pytree. On the axon
    tunnel D2H runs at ~50 MB/s, so fetching a large output dominates the
    measurement - use sync_element for big outputs.
    """
    return jax.device_get(tree)


def sync_element(tree) -> float:
    """Value-fetch sync that downloads ONE element of the first leaf.

    Fetching any element of an output buffer waits for the whole producing
    executable, so this is a correct completion barrier with O(bytes)=4 -
    the right sync for timing loops whose outputs are large (see sync()).
    """
    leaf = jax.tree.leaves(tree)[0]
    return float(jax.device_get(leaf[(0,) * leaf.ndim]))


def enable_compile_cache(repo_dir: Optional[str] = None,
                         min_compile_secs: int = 10) -> None:
    """Point the persistent XLA compilation cache at <repo>/.jax_cache.

    Full-model TPU compiles are minutes-long through the remote-compile
    tunnel; the cache makes repeat invocations of the bench/profiling tools
    cheap (note: the remote path does not share cache entries across
    processes for all executables - budget compile time regardless).
    """
    if repo_dir is None:
        repo_dir = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo_dir, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)


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
            sync(block_on)   # value fetch; block_until_ready lies (see sync)
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
