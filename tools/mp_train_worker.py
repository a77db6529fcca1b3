"""Worker for the multi-process mini-train test (tools/test_multiprocess.sh).

Runs the REAL Trainer (sharded jitted step, orbax checkpoints, validation)
for one epoch of synthetic tiny-geometry data, either single-process or as
one member of an N-process jax.distributed run over 127.0.0.1. With the
loaders striding the same global shuffle (ThreadedLoader shard_id/num_shards)
each global step consumes the same sample multiset in both modes, so the
per-step loss trajectory must match the single-process run - the assertion
test_multiprocess.sh performs on the two runs' metric files.

Usage: mp_train_worker.py <proc_id> <num_procs> <port> <workdir>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

proc_id = int(sys.argv[1])
num_procs = int(sys.argv[2])
port = sys.argv[3]
workdir = sys.argv[4]

os.environ.pop("JAX_PLATFORMS", None)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/ccvpe_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

if num_procs > 1:
    from ccvpe_tpu.core.mesh import init_distributed
    init_distributed(f"127.0.0.1:{port}", num_procs, proc_id)

import numpy as np

from ccvpe_tpu.core import config as cfg_lib
from ccvpe_tpu.data.loader import ThreadedLoader
from ccvpe_tpu.train.trainer import Trainer


class SyntheticDataset:
    """Random (grd, sat) pairs with consistent GT scalars; sample i is a
    pure function of i so every process renders identical data."""

    def __init__(self, cfg, n=16):
        self.cfg, self.n = cfg, n

    def __len__(self):
        return self.n

    def __getitem__(self, i, rng=None):
        r = np.random.default_rng(i)
        hg, wg = self.cfg.grd_size
        hs, ws = self.cfg.sat_size
        return {
            "grd": r.normal(size=(hg, wg, 3)).astype(np.float32),
            "sat": r.normal(size=(hs, ws, 3)).astype(np.float32),
            "row_offset": np.float32(r.uniform(-20, 20)),
            "col_offset": np.float32(r.uniform(-20, 20)),
            "angle_deg": np.float32(r.uniform(0, 360)),
        }


GLOBAL_BATCH = 8

assert jax.process_count() == num_procs, jax.process_count()
shard_id, num_shards = jax.process_index(), jax.process_count()
local_bs = GLOBAL_BATCH // num_shards

model_cfg = cfg_lib.tiny()
train_cfg = cfg_lib.TrainConfig(batch_size=GLOBAL_BATCH, epochs=1,
                                log_every=1)
dataset = SyntheticDataset(model_cfg, n=16)
trainer = Trainer(model_cfg, train_cfg, workdir=workdir)
trainer.fit(
    train_loader_fn=lambda epoch: ThreadedLoader(
        dataset, local_bs, shuffle=True, seed=epoch, num_workers=2,
        shard_id=shard_id, num_shards=num_shards),
    val_loader_fn=lambda epoch: ThreadedLoader(
        dataset, local_bs, shuffle=False, num_workers=2,
        shard_id=shard_id, num_shards=num_shards),
    meters_per_pixel=lambda c: 0.1,
)
print(f"proc {proc_id}/{num_procs}: mini-train done "
      f"(step {int(trainer.state.step)})")
