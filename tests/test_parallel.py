"""Multi-chip tests on the 8-device virtual CPU mesh: DP gradient equivalence,
sharded train step, spatial sharding of the forward pass."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from rcot_tpu.models.restormer import apply_tnet, init_tnet
from rcot_tpu.parallel.sharding import (batch_sharding, make_mesh, replicate,
                                        shard_batch, shard_state,
                                        spatial_sharding, tensor_shardings)
from rcot_tpu.train.steps import Batch, create_train_state, make_train_iteration


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must force 8 virtual devices"
    return make_mesh(data=8)


class TestMesh:
    def test_mesh_shape(self, mesh8):
        assert mesh8.shape == {"data": 8, "spatial": 1, "tensor": 1}

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


class TestTensorParallel:
    """Megatron-style channel sharding of the transformer blocks over the
    'tensor' mesh axis (green-field; the reference is single-GPU, SURVEY §2)."""

    def test_tensor_shardings_specs(self, tiny_model_cfg):
        mesh = make_mesh(data=4, tensor=2)
        p = init_tnet(jax.random.PRNGKey(0), tiny_model_cfg)
        sh = tensor_shardings(mesh, p)
        # level-1 block: dim=8, GDFN hidden int(2.66*8)=21 — the smallest
        # dims, so it exercises both the sharded and non-divisible branches
        blk, sblk = p["encoder_level1"][0], sh["encoder_level1"][0]
        # column-parallel: qkv weight shards its OUTPUT channels (+ its bias,
        # when present); row-parallel: proj weight shards its INPUT channels
        assert sblk["attn"]["qkv"]["w"].spec == P(None, None, None, "tensor")
        assert sblk["attn"]["proj"]["w"].spec == P(None, None, "tensor", None)
        # LayerNorm needs the full channel axis -> replicated
        assert sblk["norm1"]["w"].spec == P()
        # GDFN hidden = int(2.66*dim) = 21 at dim=8: proj_in's OUTPUT dim is
        # 2*hid = 42 (even -> shards), but proj_out's INPUT dim is hid = 21
        # (odd) -> the non-divisible fallback replicates instead of erroring
        assert blk["ffn"]["proj_in"]["w"].shape[3] == 42
        assert sblk["ffn"]["proj_in"]["w"].spec == P(None, None, None,
                                                     "tensor")
        assert sblk["ffn"]["proj_out"]["w"].spec == P()
        # embeddings replicate
        assert sh["patch_embed"]["w"].spec == P()

    @pytest.mark.slow
    def test_tensor_sharded_forward_matches_replicated(self, tiny_model_cfg):
        mesh = make_mesh(data=4, tensor=2)
        p = init_tnet(jax.random.PRNGKey(0), tiny_model_cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 3))

        ref, _, _ = apply_tnet(p, x, tiny_model_cfg)

        p_tp = shard_state(mesh, p)
        xs = jax.device_put(x, batch_sharding(mesh))
        out, _, _ = jax.jit(
            lambda p, x: apply_tnet(p, x, tiny_model_cfg))(p_tp, xs)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=1e-5)

    @pytest.mark.slow
    def test_tensor_sharded_train_iteration_matches(self, tiny_config):
        """One full minimax iteration with params channel-sharded over
        'tensor' x batch over 'data' reproduces the single-device step."""
        batch = Batch(
            degraded=np.random.default_rng(0).uniform(
                size=(4, 32, 32, 3)).astype(np.float32),
            target=np.random.default_rng(1).uniform(
                size=(4, 32, 32, 3)).astype(np.float32),
            de_id=np.arange(4, dtype=np.int32) % 5,
        )
        it = jax.jit(make_train_iteration(tiny_config))

        state0 = create_train_state(jax.random.PRNGKey(0), tiny_config)
        _, ref_metrics = it(state0, jax.tree_util.tree_map(jnp.asarray, batch),
                            jax.random.PRNGKey(2), jnp.array(False),
                            jnp.float32(1e-4))

        mesh = make_mesh(data=2, tensor=2,
                         devices=jax.devices()[:4])
        state = shard_state(
            mesh, create_train_state(jax.random.PRNGKey(0), tiny_config))
        sbatch = shard_batch(mesh, batch)
        new_state, metrics = it(state, sbatch, jax.random.PRNGKey(2),
                                jnp.array(False), jnp.float32(1e-4))
        jax.block_until_ready(new_state)
        for k in ref_metrics:
            np.testing.assert_allclose(float(metrics[k]),
                                       float(ref_metrics[k]),
                                       rtol=5e-4, atol=1e-5, err_msg=k)


class TestCollectiveAudit:
    """Pin the collective SCHEDULE each sharding config compiles to
    (parallel/audit.py; perf/collective_audit.json carries the measured
    byte volumes). No multi-chip hardware exists here, so the schedule —
    not time — is the testable contract."""

    def test_audit_hlo_parses_kinds_and_bytes(self):
        from rcot_tpu.parallel.audit import audit_hlo
        hlo = "\n".join([
            # explicit-list groups of 4 -> "data"
            "  %ar = f32[4,8,8,16]{3,2,1,0} all-reduce(%x), "
            "replica_groups={{0,2,4,6},{1,3,5,7}}, to_apply=%add",
            # iota syntax [n_groups,group_size]<=[total]: groups of 2 ->
            # "tensor"; tuple shape sums both components
            "  %ag = (bf16[2,4]{1,0}, bf16[2,4]{1,0}) all-gather(%a, %b), "
            "replica_groups=[4,2]<=[8], dimensions={0}",
            # permutes carry source_target_pairs; stride 1 -> "tensor"
            "  %cp = f32[2,4]{1,0} collective-permute(%c), "
            "source_target_pairs={{0,1},{2,3},{4,5},{6,7}}",
            "  %mm = f32[8,8]{1,0} dot(%p, %q)",  # not a collective
        ])
        rep = audit_hlo(hlo, {2: "tensor", 4: "data"}, {1: "tensor"})
        assert rep["per_kind"]["all-reduce"]["count"] == 1
        assert rep["per_kind"]["all-reduce"]["bytes"] == 4 * 8 * 8 * 16 * 4
        assert rep["per_kind"]["all-reduce"]["by_axis"]["data"]["count"] == 1
        assert rep["per_kind"]["all-gather"]["bytes"] == 2 * (2 * 4 * 2)
        assert rep["per_kind"]["all-gather"]["by_axis"]["tensor"]["count"] == 1
        assert rep["per_kind"]["collective-permute"]["by_axis"]["tensor"][
            "count"] == 1
        assert rep["total"]["count"] == 3

    def test_audit_hlo_async_start_and_empty_groups(self):
        """Advisor r3: (a) async -start tuples carry operand+result+context,
        so only the result half is payload; (b) replica_groups={} means ALL
        devices and must classify through n_devices."""
        from rcot_tpu.parallel.audit import audit_hlo
        hlo = "\n".join([
            # async all-gather-start: (operand, result, ctx, ctx) — payload
            # is the result component only (256 f32 = 1024 bytes)
            "  %ags = (f32[128]{0}, f32[256]{0}, u32[], u32[]) "
            "all-gather-start(%x), replica_groups=[4,2]<=[8], dimensions={0}",
            # empty groups = one group of all 8 devices
            "  %ar = f32[16]{0} all-reduce(%y), replica_groups={}, "
            "to_apply=%add",
        ])
        rep = audit_hlo(hlo, {2: "tensor", 8: "mesh"}, n_devices=8)
        assert rep["per_kind"]["all-gather"]["bytes"] == 256 * 4
        assert rep["per_kind"]["all-gather"]["by_axis"]["tensor"]["bytes"] \
            == 256 * 4
        assert rep["per_kind"]["all-reduce"]["by_axis"]["mesh"]["count"] == 1

    def test_dp_forward_needs_no_collectives(self, mesh8, tiny_model_cfg):
        """Pure DP inference is embarrassingly parallel: replicated params +
        data-sharded batch must compile to ZERO collectives."""
        from rcot_tpu.parallel.audit import audit_hlo
        p = replicate(mesh8, init_tnet(jax.random.PRNGKey(0), tiny_model_cfg))
        x = jax.device_put(jnp.zeros((8, 32, 32, 3)), batch_sharding(mesh8))
        hlo = jax.jit(
            lambda p, x: apply_tnet(p, x, tiny_model_cfg)[0]).lower(
                p, x).compile().as_text()
        assert audit_hlo(hlo)["total"]["count"] == 0

    def test_tp_forward_pays_row_parallel_reduces(self, tiny_model_cfg):
        """Channel-sharded params force a cross-'tensor' reduction at every
        row-parallel projection — the analytic TP communication bill
        (sharding.py scope note). The audit must see it."""
        from rcot_tpu.parallel.audit import audit_hlo
        mesh = make_mesh(data=4, tensor=2)
        p = shard_state(mesh, init_tnet(jax.random.PRNGKey(0),
                                        tiny_model_cfg))
        x = jax.device_put(jnp.zeros((4, 32, 32, 3)), batch_sharding(mesh))
        hlo = jax.jit(
            lambda p, x: apply_tnet(p, x, tiny_model_cfg)[0]).lower(
                p, x).compile().as_text()
        rep = audit_hlo(hlo, {2: "tensor", 4: "data", 8: "data*tensor"},
                        n_devices=8)
        reduces = (rep["per_kind"].get("all-reduce", {"count": 0})["count"]
                   + rep["per_kind"].get("reduce-scatter",
                                         {"count": 0})["count"])
        assert reduces >= 1, rep
        # and none of it leaks onto the data axis (DP stays collective-free
        # in the forward)
        for kind in rep["per_kind"].values():
            assert kind["by_axis"].get("data", {"bytes": 0})["bytes"] == 0, rep


class TestGraftEntry:
    @pytest.mark.slow
    def test_dryrun_multichip_8(self):
        import __graft_entry__
        __graft_entry__.dryrun_multichip(8)
