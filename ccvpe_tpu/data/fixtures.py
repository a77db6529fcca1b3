"""Deterministic test-orientation fixtures for the VIGOR "unknown
orientation" evaluation.

The reference ships samearea/crossarea_orientation_test.npy (52,605 /
53,694 float64 angles in degrees) and indexes them per test sample so the
random-orientation evaluation is reproducible (reference train_VIGOR.py:73-79,
datasets.py:109-116). We vendor a float32 re-encoding (max round-trip error
1.6e-5 degrees, far below any int pixel-roll boundary in practice) in
ccvpe_tpu/assets/orientation_test.npz so evaluation does not depend on the
reference mount; when the mount IS present (CCVPE_REFERENCE) the exact
float64 originals are preferred.
"""

from __future__ import annotations

import os

import numpy as np

_ASSET = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "assets", "orientation_test.npz")

_EXPECTED_LEN = {"samearea": 52605, "crossarea": 53694}


def load_orientation_fixture(area: str) -> np.ndarray:
    """Fixed random test orientations (degrees) for `area` in
    {samearea, crossarea}. Raises FileNotFoundError if neither the reference
    mount nor the vendored asset is available - the unknown-orientation eval
    must never silently fall back to fresh random orientations."""
    if area not in _EXPECTED_LEN:
        raise ValueError(f"unknown area {area!r}")
    ref = os.path.join(os.environ.get("CCVPE_REFERENCE", "/root/reference"),
                       f"{area}_orientation_test.npy")
    if os.path.exists(ref):
        return np.load(ref)
    if os.path.exists(_ASSET):
        with np.load(_ASSET) as z:
            return np.asarray(z[area], np.float64)
    raise FileNotFoundError(
        f"orientation fixture for {area!r} not found: neither "
        f"$CCVPE_REFERENCE/{area}_orientation_test.npy nor {_ASSET} exists; "
        "the unknown-orientation evaluation is not reproducible without it")
