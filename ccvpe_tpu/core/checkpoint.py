"""Checkpoint management: async, sharded, resumable.

The reference saves a bare state_dict per epoch and cannot resume (no
optimizer state, training restarts at epoch 0 - reference
train_VIGOR.py:159-163, :252). Here: Orbax checkpoints of the FULL train
state (params, batch_stats, opt_state, step) plus data-iterator epoch,
keep-N retention, restore-latest. Also imports reference .pt checkpoints via
the torch converter."""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3):
        import orbax.checkpoint as ocp
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True, enable_async_checkpointing=True),
        )

    def save(self, step: int, state: Any, cursor: Optional[dict] = None) -> None:
        """Save state plus the data-iterator cursor: `cursor` is
        {"epoch": E, "batch": B} meaning "resume at batch index B of epoch E
        under the deterministic per-epoch shuffle" - this is what makes
        mid-epoch resume exact (SURVEY.md 5's data-iterator commitment)."""
        import orbax.checkpoint as ocp
        cursor = cursor or {}
        # stable payload schema so restore templates always match
        payload = {"state": state,
                   "cursor": {"epoch": int(cursor.get("epoch", 0)),
                              "batch": int(cursor.get("batch", 0))}}
        self._mgr.save(step, args=ocp.args.StandardSave(payload))

    def restore_latest(self, template: Any) -> Optional[tuple]:
        """Returns (state, cursor) or None if no checkpoint exists."""
        import orbax.checkpoint as ocp
        step = self._mgr.latest_step()
        if step is None:
            return None
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(
                {"state": template, "cursor": {"epoch": 0, "batch": 0}}))
        return restored["state"], restored["cursor"]

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()


def load_reference_checkpoint(path: str, num_scales: int = 6):
    """Load a reference PyTorch .pt checkpoint (train_VIGOR.py:252) and
    convert to (params_flat, stats_flat) for this framework's CVM."""
    import torch
    from ccvpe_tpu.utils.torch_convert import convert_cvm
    sd = torch.load(path, map_location="cpu")
    sd = {k: v.numpy() for k, v in sd.items()}
    return convert_cvm(sd, num_scales=num_scales)
