"""Multi-device tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlsp_tpu.parallel import make_mesh, replicate, replicated_sharding, shard_batch


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_shard_batch_layout():
    mesh = make_mesh()
    x = np.zeros((16, 8, 3), np.float32)
    xs = shard_batch(mesh, x)
    assert xs.sharding.num_devices == 8
    # leading axis split into 8 shards of 2
    shard_shapes = {s.data.shape for s in xs.addressable_shards}
    assert shard_shapes == {(2, 8, 3)}


def test_dp_step_matches_single_device():
    """A sharded jitted matmul-and-reduce equals its single-device result
    (XLA inserts the cross-device psum)."""
    mesh = make_mesh()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((16, 32)).astype(np.float32)
    w = rng.standard_normal((32, 4)).astype(np.float32)

    @jax.jit
    def grad_step(w, x):
        def loss(w):
            return jnp.mean(jnp.square(x @ w))
        return jax.grad(loss)(w)

    g_single = np.asarray(grad_step(w, x))
    xs = shard_batch(mesh, x)
    ws = jax.device_put(w, replicated_sharding(mesh))
    g_sharded = np.asarray(grad_step(ws, xs))
    np.testing.assert_allclose(g_sharded, g_single, rtol=1e-5, atol=1e-6)


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (32, 10)
