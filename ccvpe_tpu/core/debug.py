"""Debug / determinism modes (SURVEY.md 5: the XLA-managed-memory analog of
sanitizers - NaN checking and bitwise-deterministic execution flags)."""

from __future__ import annotations

import contextlib

import jax


def enable_nan_checks() -> None:
    """Raise on any NaN produced inside jitted code (jax_debug_nans)."""
    jax.config.update("jax_debug_nans", True)


def disable_nan_checks() -> None:
    jax.config.update("jax_debug_nans", False)


@contextlib.contextmanager
def nan_checks():
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def enable_deterministic() -> None:
    """Bitwise-deterministic mode: partitionable threefry (sharding-invariant
    random streams) + deterministic XLA reductions where supported."""
    jax.config.update("jax_threefry_partitionable", True)
    jax.config.update("jax_default_prng_impl", "threefry2x32")
