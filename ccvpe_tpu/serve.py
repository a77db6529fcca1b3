"""Serving: a warm, fixed-shape inference engine for pose estimation.

The reference has no serving story (research scripts only). For production
streams (e.g. the Oxford sequential workload, SURVEY.md 3.4) this provides:

  * a single warm jitted executable per batch shape (compile once, reuse)
  * automatic micro-batching with padding to the compiled batch size
    (static shapes - no XLA recompiles at runtime)
  * pose decoding on-device, scalars back to the host

Usage:
    engine = InferenceEngine.from_checkpoint(cfg, "runs/vigor/checkpoints")
    poses = engine.predict(grd_batch, sat_batch)   # list of PoseResult
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ccvpe_tpu.core.config import ModelConfig
from ccvpe_tpu.models.cvm import CVM
from ccvpe_tpu.ops import pose


@dataclasses.dataclass
class PoseResult:
    row: int                 # heatmap argmax row on the aerial patch
    col: int
    angle_deg: float         # decoded orientation
    probability: float       # heatmap peak value


class InferenceEngine:
    def __init__(self, model_cfg: ModelConfig, params, batch_stats,
                 batch_size: int = 8):
        self.model_cfg = model_cfg
        self.batch_size = batch_size
        self.model = CVM(model_cfg)
        self._params = params
        self._batch_stats = batch_stats

        def fn(params, batch_stats, grd, sat):
            from ccvpe_tpu.train.step import device_normalize
            out = self.model.apply(
                {"params": params, "batch_stats": batch_stats},
                device_normalize(grd), device_normalize(sat), False)
            rows, cols, angle = pose.decode_pose(out.heatmap, out.ori)
            b = out.heatmap.shape[0]
            peak = out.heatmap.reshape(b, -1).max(axis=-1)
            return rows, cols, angle, peak

        self._fn = jax.jit(fn)

    @classmethod
    def from_checkpoint(cls, model_cfg: ModelConfig, checkpoint: str,
                        batch_size: int = 8) -> "InferenceEngine":
        """checkpoint: an Orbax run dir or a reference-format .pt file."""
        from ccvpe_tpu.train.evaluate import _load_params
        _, params, batch_stats = _load_params(model_cfg, checkpoint)
        return cls(model_cfg, params, batch_stats, batch_size)

    def warmup(self) -> None:
        hg, wg = self.model_cfg.grd_size
        hs, ws = self.model_cfg.sat_size
        z = np.zeros((self.batch_size, hg, wg, 3), np.float32)
        s = np.zeros((self.batch_size, hs, ws, 3), np.float32)
        jax.block_until_ready(self._fn(self._params, self._batch_stats, z, s))

    def predict(self, grd: np.ndarray, sat: np.ndarray) -> List[PoseResult]:
        """grd [N,Hg,Wg,3], sat [N,Hs,Ws,3] (any N): runs in fixed-size
        chunks, padding the tail so the executable never recompiles."""
        n = grd.shape[0]
        results: List[PoseResult] = []
        for start in range(0, n, self.batch_size):
            g = grd[start:start + self.batch_size]
            s = sat[start:start + self.batch_size]
            valid = g.shape[0]
            if valid < self.batch_size:
                pad = self.batch_size - valid
                g = np.concatenate([g, np.zeros((pad, *g.shape[1:]), g.dtype)])
                s = np.concatenate([s, np.zeros((pad, *s.shape[1:]), s.dtype)])
            rows, cols, angle, peak = self._fn(
                self._params, self._batch_stats, g, s)
            rows, cols = np.asarray(rows), np.asarray(cols)
            angle, peak = np.asarray(angle), np.asarray(peak)
            for i in range(valid):
                results.append(PoseResult(int(rows[i]), int(cols[i]),
                                          float(angle[i]), float(peak[i])))
        return results


def export_stablehlo(model_cfg: ModelConfig, params, batch_stats,
                     batch_size: int = 1) -> bytes:
    """Serialize the inference function (forward + pose decode) to a portable
    StableHLO artifact via jax.export - deployable without Python model code.
    Restore with jax.export.deserialize(blob).call(params, stats, grd, sat).
    """
    model = CVM(model_cfg)

    def fn(params, batch_stats, grd, sat):
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          grd, sat, False)
        rows, cols, angle = pose.decode_pose(out.heatmap, out.ori)
        return rows, cols, angle, out.heatmap

    hg, wg = model_cfg.grd_size
    hs, ws = model_cfg.sat_size
    exported = jax.export.export(jax.jit(fn))(
        params, batch_stats,
        jax.ShapeDtypeStruct((batch_size, hg, wg, 3), jnp.float32),
        jax.ShapeDtypeStruct((batch_size, hs, ws, 3), jnp.float32))
    return bytes(exported.serialize())
