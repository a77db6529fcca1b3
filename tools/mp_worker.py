"""Worker for the 2-process distributed smoke test (tools/test_multiprocess.sh).

Each process runs jax.distributed.initialize over 127.0.0.1, contributes one
CPU device to a global 2-device 'data' mesh, and executes a psum and a
sharded dot product; process 0 asserts the globally-reduced values.

This validates the multi-host init path (core/mesh.py::init_distributed) and
cross-process collectives without TPU pod hardware.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

proc_id = int(sys.argv[1])
num_procs = int(sys.argv[2])
port = sys.argv[3]

os.environ.pop("JAX_PLATFORMS", None)

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=num_procs,
    process_id=proc_id,
)

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ccvpe_tpu.core.mesh import all_hosts_gather, make_mesh

assert jax.process_count() == num_procs, jax.process_count()
assert len(jax.devices()) == num_procs, jax.devices()

mesh = make_mesh(data=num_procs, model=1)

# global array sharded across processes: each host provides its local shard
local = np.full((1, 4), float(proc_id + 1), np.float32)
sharding = NamedSharding(mesh, P("data", None))
global_arr = jax.make_array_from_process_local_data(sharding, local, (num_procs, 4))


@jax.jit
def global_sum(x):
    return jnp.sum(x)


total = float(global_sum(global_arr))
expected = sum((i + 1) * 4 for i in range(num_procs))
assert total == expected, (total, expected)

gathered = all_hosts_gather(np.array([proc_id], np.int64))
assert sorted(np.asarray(gathered).ravel().tolist()) == list(range(num_procs))

print(f"proc {proc_id}: distributed psum/gather OK (total={total})")
