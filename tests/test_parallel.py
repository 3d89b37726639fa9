"""Mesh/sharding tests (run on the 8-device virtual CPU mesh; skipped on a
single-chip topology — see conftest for the env recipe)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cald_tpu.parallel import batch_sharding, data_mesh, host_gather, replicate, shard_batch

multi_device = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 devices (virtual CPU mesh)")


@multi_device
class TestMesh:
    def test_shard_batch_layout(self):
        mesh = data_mesh()
        x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
        xs = shard_batch(x, mesh)
        assert xs.sharding.spec == jax.sharding.PartitionSpec("data")
        np.testing.assert_array_equal(host_gather(xs), x)

    def test_replicate(self):
        mesh = data_mesh()
        p = replicate({"w": np.ones((3, 3), np.float32)}, mesh)
        assert p["w"].sharding.spec == jax.sharding.PartitionSpec()

    def test_dp_mean_matches_single_device(self):
        """A jitted global-batch mean over a sharded batch equals the host
        value — the automatic psum replacing reduce_dict (utils.py:118-142)."""
        mesh = data_mesh()
        x = np.arange(32, dtype=np.float32)
        xs = shard_batch(x, mesh)
        got = jax.jit(jnp.mean)(xs)
        assert float(got) == pytest.approx(float(x.mean()))

    def test_dp_gradient_allreduce(self):
        """Gradients of a replicated param w.r.t. a sharded batch are summed
        across shards by XLA (DDP semantics)."""
        mesh = data_mesh()
        w = replicate(jnp.asarray(2.0), mesh)
        x = shard_batch(np.arange(8, dtype=np.float32), mesh)

        def loss(w, x):
            return jnp.sum(w * x)

        g = jax.jit(jax.grad(loss))(w, x)
        assert float(g) == pytest.approx(float(np.arange(8).sum()))

    def test_multichip_dryrun_entry(self):
        """The driver-facing hook compiles+runs a full DP train step."""
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)
