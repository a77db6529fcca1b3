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


def add_distributed_flags(parser) -> None:
    """Multi-host launch flags for the train scripts: one command per
    process, `--coordinator host:port --num_processes N --process_id i`,
    or env vars CCVPE_{COORDINATOR,NUM_PROCESSES,PROCESS_ID}."""
    import os
    g = parser.add_argument_group("distributed")
    g.add_argument("--coordinator",
                   default=os.environ.get("CCVPE_COORDINATOR"),
                   help="host:port of process 0 for jax.distributed")
    g.add_argument("--num_processes", type=int,
                   default=int(os.environ.get("CCVPE_NUM_PROCESSES", "1")))
    g.add_argument("--process_id", type=int,
                   default=int(os.environ.get("CCVPE_PROCESS_ID", "0")))


def setup_distributed(args):
    """Initialize the multi-host runtime from parsed flags. Returns
    (shard_id, num_shards) for per-host data-loader striding; each host
    then loads batch_size/num_shards samples per step and shard_batch
    assembles the global array."""
    init_distributed(getattr(args, "coordinator", None),
                     getattr(args, "num_processes", None),
                     getattr(args, "process_id", None))
    return jax.process_index(), jax.process_count()


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
    """Place a pytree of host arrays with the leading dim sharded on 'data'.

    Single-process: device_put of the full batch. Multi-process: each host
    passes only ITS shard of the global batch (loaded via
    ThreadedLoader(shard_id, num_shards)); the global array is assembled
    without any cross-host transfer."""
    sh = data_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        batch)


def replicate(mesh: Mesh, tree):
    """Place a pytree replicated over the mesh (params / train state).
    Works in multi-process runs, where device_put to a sharding spanning
    non-addressable devices is not allowed."""
    sh = replicated(mesh)
    if jax.process_count() == 1:
        return jax.device_put(tree, sh)

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])
    return jax.tree.map(put, tree)


def all_hosts_gather(x):
    """Gather a per-host numpy array across processes (eval metric
    aggregation; no-op single-process). Uses jax.experimental.multihost_utils
    over DCN."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(np.asarray(x)))


def all_hosts_concat(x):
    """Concatenate variable-length per-host 1-D arrays across processes
    (per-sample eval metrics from sharded loaders, where hosts may hold
    unequal sample counts). No-op single-process."""
    if jax.process_count() == 1:
        return np.asarray(x)
    x = np.asarray(x, np.float64)
    lens = all_hosts_gather(np.array([x.shape[0]], np.int64)).ravel()
    width = int(lens.max())
    padded = np.zeros((width,), np.float64)
    padded[: x.shape[0]] = x
    stacked = all_hosts_gather(padded)  # [P, width]
    return np.concatenate([stacked[p, : lens[p]] for p in range(len(lens))])
