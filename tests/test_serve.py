"""Serving engine: fixed-shape micro-batching, padding correctness, AOT
StableHLO export round trip."""

import jax
import numpy as np
import pytest

from ccvpe_tpu.core import config as cfg_lib
from ccvpe_tpu.serve import InferenceEngine, export_stablehlo
from ccvpe_tpu.train.step import create_train_state


@pytest.fixture(scope="module")
def engine():
    cfg = cfg_lib.tiny()
    _, state, _ = create_train_state(cfg, cfg_lib.TrainConfig(),
                                     jax.random.PRNGKey(17))
    eng = InferenceEngine(cfg, state.params, state.batch_stats, batch_size=4)
    return cfg, eng


@pytest.mark.slow
def test_predict_batching_and_padding(engine):
    cfg, eng = engine
    hg, wg = cfg.grd_size
    hs, ws = cfg.sat_size
    rng = np.random.default_rng(0)
    n = 6  # forces one full chunk + one padded chunk
    grd = rng.normal(size=(n, hg, wg, 3)).astype(np.float32)
    sat = rng.normal(size=(n, hs, ws, 3)).astype(np.float32)
    results = eng.predict(grd, sat)
    assert len(results) == n
    for r in results:
        assert 0 <= r.row < hs and 0 <= r.col < ws
        assert 0.0 <= r.angle_deg < 360.0
        assert 0.0 < r.probability <= 1.0
    # padded-tail results must equal an unpadded run of the same samples
    again = eng.predict(grd[4:], sat[4:])
    for a, b in zip(results[4:], again):
        assert (a.row, a.col) == (b.row, b.col)
        np.testing.assert_allclose(a.angle_deg, b.angle_deg, atol=1e-4)


@pytest.mark.slow
def test_stablehlo_export_roundtrip(engine):
    cfg, eng = engine
    blob = export_stablehlo(cfg, eng._params, eng._batch_stats, batch_size=1)
    assert isinstance(blob, bytes) and len(blob) > 1000
    restored = jax.export.deserialize(blob)
    hg, wg = cfg.grd_size
    hs, ws = cfg.sat_size
    rng = np.random.default_rng(1)
    grd = rng.normal(size=(1, hg, wg, 3)).astype(np.float32)
    sat = rng.normal(size=(1, hs, ws, 3)).astype(np.float32)
    rows, cols, angle, heatmap = restored.call(
        eng._params, eng._batch_stats, grd, sat)
    ref = eng.predict(grd, sat)[0]
    assert int(np.asarray(rows)[0]) == ref.row
    assert int(np.asarray(cols)[0]) == ref.col
    np.testing.assert_allclose(float(np.asarray(angle)[0]), ref.angle_deg,
                               atol=1e-3)
