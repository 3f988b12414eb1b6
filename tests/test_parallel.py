"""Multi-device mesh tests over the 8 virtual CPU devices (conftest sets
--xla_force_host_platform_device_count=8). The reference has no distributed
tests at all (its DDP path is pragma: no cover); here the SPMD path runs in
CI."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deepof_tpu.parallel.mesh import (
    create_mesh,
    data_sharding,
    replicate_sharding,
    shard_batch,
)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_shard_batch_pads_and_shards():
    mesh = create_mesh()
    x = np.arange(10 * 3, dtype=np.float32).reshape(10, 3)
    placed = shard_batch(x, mesh)
    # 10 rows pad to 16 (next multiple of 8) by repeating the last row.
    assert placed.shape == (16, 3)
    np.testing.assert_array_equal(np.asarray(placed)[10:], np.tile(x[-1], (6, 1)))
    assert len(placed.sharding.device_set) == 8

    tree = shard_batch({"a": x, "b": np.ones((16, 2))}, mesh)
    assert tree["a"].shape == (16, 3) and tree["b"].shape == (16, 2)


def test_sharded_step_matches_replicated():
    """A jitted SGD step gives identical results for sharded and
    single-device batches — XLA's inserted collectives are exact here."""
    mesh = create_mesh()
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(5, 1)), jnp.float32)
    x = rng.normal(size=(32, 5)).astype(np.float32)
    y = rng.normal(size=(32, 1)).astype(np.float32)

    def loss_fn(w, x, y):
        return jnp.mean((x @ w - y) ** 2)

    @jax.jit
    def step(w, x, y):
        g = jax.grad(loss_fn)(w, x, y)
        return w - 0.1 * g

    w_sharded = jax.device_put(w, replicate_sharding(mesh))
    xs, ys = shard_batch((x, y), mesh)
    w1 = step(w_sharded, xs, ys)
    w2 = step(w, jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), rtol=1e-6)


def test_sharded_train_step_runs_on_mesh():
    """A realistic donated optax step over the full mesh stays finite and
    keeps parameters replicated."""
    mesh = create_mesh()
    rng = np.random.default_rng(1)
    params = {"w": jnp.asarray(rng.normal(size=(6, 4)), jnp.float32),
              "b": jnp.zeros(4)}
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)
    params = jax.device_put(params, replicate_sharding(mesh))
    opt_state = jax.device_put(opt_state, replicate_sharding(mesh))

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            return jnp.mean((x @ p["w"] + p["b"] - y) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    x = rng.normal(size=(64, 6)).astype(np.float32)
    y = rng.normal(size=(64, 4)).astype(np.float32)
    xs, ys = shard_batch((x, y), mesh)
    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, xs, ys)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    # Params stay addressable from every device (replicated layout).
    assert len(params["w"].sharding.device_set) in (1, 8)
