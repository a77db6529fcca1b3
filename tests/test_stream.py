"""Sequential streaming eval core (train/stream.py): the Oxford >=14 FPS
workload loop, on a synthetic dataset with the tiny model geometry."""

import dataclasses

import jax
import numpy as np
import pytest

from ccvpe_tpu.core import config as cfg_lib
from ccvpe_tpu.train.step import create_train_state, make_eval_step
from ccvpe_tpu.train.stream import stream_eval


@dataclasses.dataclass
class _Sample:
    grd: np.ndarray
    sat: np.ndarray
    row_offset: np.ndarray
    col_offset: np.ndarray
    angle_deg: np.ndarray


class SyntheticTraversal:
    """Deterministic per-frame synthetic dataset (tiny geometry)."""

    def __init__(self, cfg, n):
        self.cfg = cfg
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i, rng=None):
        r = np.random.default_rng(i)
        hg, wg = self.cfg.grd_size
        hs, ws = self.cfg.sat_size
        return _Sample(
            grd=r.normal(size=(hg, wg, 3)).astype(np.float32),
            sat=r.normal(size=(hs, ws, 3)).astype(np.float32),
            row_offset=np.float32(r.uniform(-hs / 4, hs / 4)),
            col_offset=np.float32(r.uniform(-ws / 4, ws / 4)),
            angle_deg=np.float32(r.uniform(0, 360)),
        )


@pytest.mark.slow
def test_stream_eval_summary_and_sharding():
    cfg = cfg_lib.tiny()
    model, state, _ = create_train_state(cfg, cfg_lib.TrainConfig(),
                                         jax.random.PRNGKey(17))
    eval_step = make_eval_step(model, cfg)
    dataset = SyntheticTraversal(cfg, 14)

    summary = stream_eval(model, cfg, state.params, state.batch_stats,
                          dataset, indices=range(14), batch_size=4,
                          meters_per_pixel=0.25, num_workers=2,
                          eval_step=eval_step)
    assert summary["frames"] == 14
    assert summary["fps"] > 0
    for key in ("mean_distance_m", "median_distance_m", "mean_ori_deg",
                "long_recall@1", "lat_recall@3", "ori_recall@5deg"):
        assert key in summary
    # distances bounded by the tile diagonal in meters
    hs, ws = cfg.sat_size
    assert summary["mean_distance_m"] <= np.hypot(hs, ws) * 0.25

    # 2-shard split covers disjoint halves: frame counts add up
    s0 = stream_eval(model, cfg, state.params, state.batch_stats, dataset,
                     indices=range(14), batch_size=4, num_workers=2,
                     shard_id=0, num_shards=2, eval_step=eval_step)
    s1 = stream_eval(model, cfg, state.params, state.batch_stats, dataset,
                     indices=range(14), batch_size=4, num_workers=2,
                     shard_id=1, num_shards=2, eval_step=eval_step)
    assert s0["frames"] + s1["frames"] == 14


@pytest.mark.slow
def test_stream_eval_depth_invariant():
    """The k-deep async-copy pipeline (r4) must produce identical metrics
    at any pipeline_depth - overlap changes latency, never values."""
    cfg = cfg_lib.tiny()
    model, state, _ = create_train_state(cfg, cfg_lib.TrainConfig(),
                                         jax.random.PRNGKey(17))
    eval_step = make_eval_step(model, cfg)
    dataset = SyntheticTraversal(cfg, 10)

    outs = [
        stream_eval(model, cfg, state.params, state.batch_stats, dataset,
                    indices=range(10), batch_size=3, meters_per_pixel=0.25,
                    num_workers=2, eval_step=eval_step, pipeline_depth=d)
        for d in (1, 4, 16)
    ]
    for other in outs[1:]:
        for k, v in outs[0].items():
            if k in ("fps", "aggregate_fps"):
                continue
            assert other[k] == pytest.approx(v), (k, v, other[k])
