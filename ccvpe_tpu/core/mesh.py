"""Device mesh and distributed runtime initialization.

The reference is single-process single-GPU (reference train_KITTI.py:3 pins
CUDA_VISIBLE_DEVICES; no DDP/NCCL anywhere). Parallelism here is new,
TPU-native design (SURVEY.md 2.4): a ('data', 'model') mesh over ICI/DCN,
batch sharding on 'data' (gradients reduced by XLA-inserted collectives under
jit), and an optional 'model' axis for spatial/orientation-axis sharding.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host runtime init (no-op for single-process runs)."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ('data', 'model') mesh. Defaults to all devices on 'data'.

    On multi-host slices jax device order already groups by host, so the
    'data' axis rides DCN across hosts and ICI within - the layout the
    gradient psum wants.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"{data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for input arrays."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays with the leading dim sharded on 'data'."""
    sh = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def all_hosts_gather(x):
    """Gather a per-host numpy array across processes (eval metric
    aggregation; no-op single-process). Uses jax.experimental.multihost_utils
    over DCN."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(np.asarray(x)))
