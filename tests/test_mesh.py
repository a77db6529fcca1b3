"""Mesh / distributed-runtime helpers (core/mesh.py) on the virtual 8-device
CPU mesh (conftest forces --xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from ccvpe_tpu.core.mesh import (
    all_hosts_gather,
    data_sharding,
    make_mesh,
    replicated,
    shard_batch,
)


def test_make_mesh_default_all_data():
    mesh = make_mesh()
    assert mesh.axis_names == ("data", "model")
    assert mesh.shape == {"data": 8, "model": 1}


def test_make_mesh_data_model_split():
    mesh = make_mesh(model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh(data=2, model=4)
    assert mesh.shape == {"data": 2, "model": 4}


def test_make_mesh_rejects_mismatch():
    with pytest.raises(AssertionError):
        make_mesh(data=3, model=2)


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh(model=2)
    batch = {"x": np.arange(16 * 3, dtype=np.float32).reshape(16, 3),
             "y": np.arange(16, dtype=np.float32)}
    sharded = shard_batch(mesh, batch)
    for v in sharded.values():
        assert v.sharding.mesh.shape == mesh.shape
        assert v.sharding.spec == P("data")
    # values unchanged, each device holds B/4 rows of x
    np.testing.assert_array_equal(np.asarray(sharded["x"]), batch["x"])
    shard_shapes = {s.data.shape for s in sharded["x"].addressable_shards}
    assert shard_shapes == {(4, 3)}


def test_replicated_sharding_and_jit_psum_equivalence():
    """A jitted mean-gradient over the data axis equals the host computation:
    the gradient all-reduce XLA inserts under jit is correct on this mesh."""
    mesh = make_mesh()
    x = np.arange(32, dtype=np.float32).reshape(16, 2)
    w = np.array([0.5, -2.0], np.float32)
    xs = jax.device_put(x, data_sharding(mesh))
    ws = jax.device_put(w, replicated(mesh))
    assert ws.sharding.spec == P()

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    g = jax.jit(jax.grad(loss))(ws, xs)
    g_ref = jax.grad(loss)(jnp.asarray(w), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-6)


def test_all_hosts_gather_single_process_identity():
    x = np.arange(6).reshape(2, 3)
    np.testing.assert_array_equal(all_hosts_gather(x), x)
