"""SPMD data-parallel paths on the 8-device virtual CPU mesh (the JAX-native
substitute for multi-node testing, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from detectinblur_tpu.parallel.mesh import (
    local_batch_slice,
    make_mesh,
    replicate,
    shard_batch,
)


def test_mesh_shards_batch_and_replicates_params():
    mesh = make_mesh(8)
    batch = {"x": jnp.arange(16.0).reshape(16, 1)}
    sharded = shard_batch(mesh, batch)
    assert sharded["x"].sharding.is_fully_replicated is False
    params = replicate(mesh, {"w": jnp.ones((3,))})
    assert params["w"].sharding.is_fully_replicated


def test_sharded_sgd_step_matches_single_device():
    """A pmean-free jit step over the mesh must equal the single-device
    result (the partitioner inserts the gradient reduction)."""
    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((16, 4), np.float32))
    y = jnp.asarray(rng.random((16, 1), np.float32))
    w0 = jnp.asarray(rng.random((4, 1), np.float32))

    def loss(w, x, y):
        return jnp.mean((x @ w - y) ** 2)

    def step(w, x, y):
        g = jax.grad(loss)(w, x, y)
        return w - 0.1 * g

    ref = step(w0, x, y)

    xs = shard_batch(mesh, {"x": x, "y": y})
    wrep = replicate(mesh, {"w": w0})
    out = jax.jit(step)(wrep["w"], xs["x"], xs["y"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_local_batch_slice_single_process():
    sl = local_batch_slice(16)
    assert sl == slice(0, 16)
