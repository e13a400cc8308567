"""Multi-chip tests on the 8-device virtual CPU mesh: DP gradient equivalence,
sharded train step, spatial sharding of the forward pass."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from rcot_tpu.models.restormer import apply_tnet, init_tnet
from rcot_tpu.parallel.sharding import (batch_sharding, make_mesh, replicate,
                                        shard_batch, spatial_sharding)
from rcot_tpu.train.steps import Batch, create_train_state, make_train_iteration


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must force 8 virtual devices"
    return make_mesh(data=8)


class TestMesh:
    def test_mesh_shape(self, mesh8):
        assert mesh8.shape == {"data": 8, "spatial": 1}

    @pytest.mark.slow
    def test_dp_grads_equal_single_device(self, mesh8, tiny_model_cfg):
        """psum'd DP gradients == single-device gradients on the same batch
        (SURVEY.md §4e)."""
        p = init_tnet(jax.random.PRNGKey(0), tiny_model_cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (8, 16, 16, 3))

        def loss(p, x):
            out, _, _ = apply_tnet(p, x, tiny_model_cfg)
            return jnp.mean(jnp.square(out))

        g_single = jax.grad(loss)(p, x)

        p_rep = replicate(mesh8, p)
        x_shard = jax.device_put(x, batch_sharding(mesh8))
        g_dp = jax.jit(jax.grad(loss))(p_rep, x_shard)

        for a, b in zip(jax.tree_util.tree_leaves(g_single),
                        jax.tree_util.tree_leaves(g_dp)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-5)

    @pytest.mark.slow
    def test_sharded_train_iteration(self, mesh8, tiny_config):
        state = create_train_state(jax.random.PRNGKey(0), tiny_config)
        state = replicate(mesh8, state)
        batch = Batch(
            degraded=np.random.default_rng(0).uniform(
                size=(8, 32, 32, 3)).astype(np.float32),
            target=np.random.default_rng(1).uniform(
                size=(8, 32, 32, 3)).astype(np.float32),
            de_id=np.arange(8, dtype=np.int32) % 5,
        )
        batch = shard_batch(mesh8, batch)
        it = jax.jit(make_train_iteration(tiny_config))
        new_state, metrics = it(state, batch, jax.random.PRNGKey(2),
                                jnp.array(False), jnp.float32(1e-4))
        jax.block_until_ready(new_state)
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k

    @pytest.mark.slow
    def test_spatial_sharding_forward(self, tiny_model_cfg):
        """Full-res inference with activations sharded over image rows:
        XLA inserts halo exchanges for the convs; result matches replicated."""
        mesh = make_mesh(data=1, spatial=8)
        p = init_tnet(jax.random.PRNGKey(0), tiny_model_cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))

        ref, _, _ = apply_tnet(p, x, tiny_model_cfg)

        p_rep = replicate(mesh, p)
        xs = jax.device_put(x, spatial_sharding(mesh))
        out, _, _ = jax.jit(lambda p, x: apply_tnet(p, x, tiny_model_cfg))(p_rep, xs)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=1e-5)


class TestGraftEntry:
    @pytest.mark.slow
    def test_dryrun_multichip_8(self):
        import __graft_entry__
        __graft_entry__.dryrun_multichip(8)
