"""Profiling / tracing helpers (core/profiling.py): StepTimer accounting,
HLO cost analysis, trace capture smoke."""

import glob
import os
import time

import jax.numpy as jnp
import numpy as np

from ccvpe_tpu.core.profiling import StepTimer, hlo_cost, trace


def test_step_timer_rate():
    t = StepTimer(window=10)
    assert t.items_per_s == 0.0
    t.tick(8)
    time.sleep(0.05)
    t.tick(8)
    time.sleep(0.05)
    t.tick(8)
    # 16 items over ~0.1 s
    assert 50 < t.items_per_s < 400


def test_step_timer_window_rolls():
    t = StepTimer(window=3)
    for _ in range(10):
        t.tick(1)
    assert len(t._times) <= 4


def test_hlo_cost_counts_matmul_flops():
    a = jnp.ones((128, 256), jnp.float32)
    b = jnp.ones((256, 64), jnp.float32)
    cost = hlo_cost(lambda a, b: a @ b, a, b)
    assert cost["flops"] >= 2 * 128 * 256 * 64 * 0.99


def test_trace_writes_capture(tmp_path):
    logdir = str(tmp_path / "trace")
    with trace(logdir):
        jnp.ones((64, 64)).sum().block_until_ready()
    files = glob.glob(os.path.join(logdir, "**", "*"), recursive=True)
    assert any(os.path.isfile(f) for f in files)
