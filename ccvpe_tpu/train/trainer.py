"""Epoch driver: sharded training + per-epoch validation + checkpointing.

Replaces the reference per-script loops (reference train_VIGOR.py:96-244,
train_KITTI.py, train_OxfordRobotCar.py) with one driver over the config
tree: DP-sharded jitted steps, on-device GT rendering, async checkpoints
with resume, CSV/TB metrics.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ccvpe_tpu.core.checkpoint import CheckpointManager
from ccvpe_tpu.core.config import ModelConfig, TrainConfig
from ccvpe_tpu.core.mesh import make_mesh, replicate, shard_batch
from ccvpe_tpu.core.metrics import MetricWriter
from ccvpe_tpu.train.step import (
    Batch,
    create_train_state,
    make_eval_decode_step,
    make_train_step,
)


def batch_from_numpy(b: Dict[str, np.ndarray]) -> Batch:
    return Batch(
        grd=b["grd"], sat=b["sat"],
        row_offset=b["row_offset"], col_offset=b["col_offset"],
        angle_deg=b["angle_deg"],
    )


def device_prefetch(loader: Iterable[Dict[str, np.ndarray]], mesh, depth: int = 2):
    """Iterate a host loader one step ahead, overlapping host decode + H2D
    transfer with device compute (jax transfers are async)."""
    import collections
    buf = collections.deque()
    it = iter(loader)
    try:
        while True:
            while len(buf) < depth:
                buf.append(shard_batch(mesh, batch_from_numpy(next(it))))
            yield buf.popleft()
    except StopIteration:
        while buf:
            yield buf.popleft()


class Trainer:
    def __init__(self, model_cfg: ModelConfig, train_cfg: TrainConfig,
                 workdir: str = "runs/default"):
        self.model_cfg = model_cfg
        self.train_cfg = train_cfg
        self.mesh = make_mesh()
        self.model, self.state, self.tx = create_train_state(
            model_cfg, train_cfg, jax.random.PRNGKey(train_cfg.seed))
        self.state = replicate(self.mesh, self.state)
        self.train_step = make_train_step(self.model, self.tx, model_cfg,
                                          train_cfg)
        # scalar-only fused eval (forward + decode + prob@GT on device);
        # validate() fetches [B] vectors, never full heatmaps
        self.eval_step = make_eval_decode_step(self.model, model_cfg)
        # multi-host: every process runs the same step/checkpoint calls
        # (orbax coordinates saves internally); files + prints come from
        # process 0 only
        self.is_main = jax.process_index() == 0
        self.metrics = MetricWriter(workdir, model_cfg.name)
        self.ckpt = CheckpointManager(
            f"{workdir}/{train_cfg.checkpoint_dir}", keep=train_cfg.keep_checkpoints)
        self.restored = False
        self.cursor = {"epoch": 0, "batch": 0}
        restored = self.ckpt.restore_latest(jax.tree.map(np.asarray, self.state))
        if restored is not None:
            state, self.cursor = restored
            self.state = replicate(self.mesh, state)
            self.restored = True
            print(f"resumed from step {int(self.state.step)} "
                  f"(epoch {self.cursor['epoch']}, batch {self.cursor['batch']})")
        elif train_cfg.warm_start or train_cfg.pretrained_backbone:
            self._apply_initial_weights()

    def _apply_initial_weights(self) -> None:
        """Fill weights before the first step: either a full reference CVM
        warm start, or ImageNet EfficientNet-B0 weights into BOTH encoders
        (the reference's default init, models.py:55,99 +
        efficientnet_pytorch/utils.py:729-758 - load-bearing for the
        published accuracy). Optimizer state is re-created fresh."""
        from ccvpe_tpu.utils.torch_convert import (
            convert_cvm, init_with_pretrained_backbone, load_state_dict_numpy,
            to_variables)
        cfg = self.train_cfg
        if cfg.warm_start:
            sd = load_state_dict_numpy(cfg.warm_start)
            params, stats = convert_cvm(sd, num_scales=self.model_cfg.num_scales)
            variables = to_variables(params, stats, {
                "params": self.state.params,
                "batch_stats": self.state.batch_stats})
            print(f"warm start from {cfg.warm_start}")
        else:
            sd = load_state_dict_numpy(cfg.pretrained_backbone)
            variables = init_with_pretrained_backbone(
                {"params": jax.tree.map(np.asarray, self.state.params),
                 "batch_stats": jax.tree.map(np.asarray, self.state.batch_stats)},
                sd)
            print(f"pretrained backbone init from {cfg.pretrained_backbone}")
        new_params = variables["params"]
        self.state = self.state._replace(
            params=new_params,
            batch_stats=variables.get("batch_stats", self.state.batch_stats),
            opt_state=self.tx.init(new_params))
        self.state = replicate(self.mesh, self.state)

    def train_epoch(self, loader: Iterable[Dict[str, np.ndarray]],
                    epoch: int, rng: jax.Array, start_batch: int = 0) -> None:
        """Run one epoch, optionally resuming at `start_batch` within the
        epoch's deterministic shuffle (exact mid-epoch resume). Checkpoints
        record the NEXT position to run as a (epoch, batch) cursor."""
        t_last = time.time()
        running = []
        if start_batch:
            if hasattr(loader, "start_batch"):
                loader.start_batch = start_batch  # skip without decoding
            else:
                it = iter(loader)
                for _ in range(start_batch):
                    next(it)
                loader = it
        for j, batch in enumerate(device_prefetch(loader, self.mesh)):
            i = start_batch + j  # batch index within the epoch's shuffle
            self.state, m = self.train_step(self.state, batch, rng)
            running.append(m)
            every = self.train_cfg.checkpoint_every_steps
            if every and int(self.state.step) % every == 0:
                self.ckpt.save(int(self.state.step),
                               jax.tree.map(np.asarray, self.state),
                               cursor={"epoch": epoch, "batch": i + 1})
            if (self.train_cfg.fake_fail_at_step is not None
                    and int(self.state.step) == self.train_cfg.fake_fail_at_step):
                self.ckpt.wait()
                raise RuntimeError(
                    f"fake failure injected at step {int(self.state.step)}")
            if (j + 1) % self.train_cfg.log_every == 0:
                vals = {k: float(np.mean([float(r[k]) for r in running]))
                        for k in running[0]}
                n = self.train_cfg.log_every * self.train_cfg.batch_size
                dt = time.time() - t_last
                vals["pairs_per_s"] = n / dt
                if self.is_main:
                    self.metrics.write(int(self.state.step), vals)
                    print(f"[{epoch}, {i + 1}] loss: {vals['loss']:.3f} "
                          f"({vals['pairs_per_s']:.2f} pairs/s)")
                running, t_last = [], time.time()
        self.ckpt.save(int(self.state.step),
                       jax.tree.map(np.asarray, self.state),
                       cursor={"epoch": epoch + 1, "batch": 0})

    def validate(self, loaders, meters_per_pixel, epoch: int):
        """Per-epoch evaluation. `loaders` is one loader, or a dict of named
        eval sets evaluated every epoch (the KITTI protocol runs test1 AND
        test2 each epoch, reference train_KITTI.py:168-279); recalls
        @1/3/5 m & deg are always included in the metric rows."""
        from ccvpe_tpu.train.evaluate import eval_over_loader
        named = loaders if isinstance(loaders, dict) else {"val": loaders}
        params, batch_stats = self.state.params, self.state.batch_stats
        if jax.process_count() > 1:
            # eval batches are process-local (each host walks its loader
            # shard); the replicated GLOBAL state arrays cannot join that
            # jit - drop them to local copies once per validation pass
            params, batch_stats = jax.tree.map(
                lambda x: jax.device_put(np.asarray(x)), (params, batch_stats))
        results = {}
        for name, loader in named.items():
            summary = eval_over_loader(
                self.eval_step, params, batch_stats,
                loader, self.model_cfg, meters_per_pixel)
            if self.is_main:
                self.metrics.write(
                    int(self.state.step),
                    {f"{name}/{k}": v for k, v in summary.items()})
                print(f"epoch {epoch} {name}: {summary}")
            results[name] = summary
        return results if isinstance(loaders, dict) else results["val"]

    def fit(self, train_loader_fn, val_loader_fn, meters_per_pixel,
            epochs: Optional[int] = None) -> None:
        rng = jax.random.PRNGKey(self.train_cfg.seed + 1)
        total_epochs = epochs or self.train_cfg.epochs
        # exact resume: the checkpointed cursor names the next (epoch, batch)
        # to run under each epoch's deterministic shuffle
        start_epoch = min(self.cursor["epoch"], total_epochs) if self.restored else 0
        start_batch = self.cursor["batch"] if self.restored else 0
        for epoch in range(start_epoch, total_epochs):
            self.train_epoch(train_loader_fn(epoch), epoch, rng,
                             start_batch=start_batch if epoch == start_epoch else 0)
            self.validate(val_loader_fn(epoch), meters_per_pixel, epoch)
        self.ckpt.wait()
