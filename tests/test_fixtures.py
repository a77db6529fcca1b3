"""Vendored orientation-fixture loading (reference train_VIGOR.py:73-79)."""

import numpy as np
import pytest

from ccvpe_tpu.data import fixtures


def test_vendored_matches_reference_when_mounted(monkeypatch, tmp_path):
    """The vendored float32 re-encoding must agree with the reference .npy
    to sub-1e-4-degree precision (when the mount is available)."""
    import os
    ref = os.path.join(os.environ.get("CCVPE_REFERENCE", "/root/reference"),
                       "samearea_orientation_test.npy")
    if not os.path.exists(ref):
        pytest.skip("reference mount not available")
    exact = np.load(ref)
    # force the vendored path by pointing the mount somewhere empty
    monkeypatch.setenv("CCVPE_REFERENCE", str(tmp_path))
    vendored = fixtures.load_orientation_fixture("samearea")
    assert vendored.shape == exact.shape
    np.testing.assert_allclose(vendored, exact, atol=1e-4)


def test_lengths_and_range(monkeypatch, tmp_path):
    monkeypatch.setenv("CCVPE_REFERENCE", str(tmp_path))  # vendored path
    for area, n in (("samearea", 52605), ("crossarea", 53694)):
        a = fixtures.load_orientation_fixture(area)
        assert a.shape == (n,)
        assert a.min() >= 0.0 and a.max() < 360.0


def test_missing_fixture_raises(monkeypatch, tmp_path):
    monkeypatch.setenv("CCVPE_REFERENCE", str(tmp_path))
    monkeypatch.setattr(fixtures, "_ASSET", str(tmp_path / "nope.npz"))
    with pytest.raises(FileNotFoundError):
        fixtures.load_orientation_fixture("samearea")
    with pytest.raises(ValueError):
        fixtures.load_orientation_fixture("bogus")
