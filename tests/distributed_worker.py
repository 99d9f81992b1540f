"""Worker process for the multi-process distributed test (not a test file).

Usage: python tests/distributed_worker.py <coordinator> <num_procs> <pid>

Each process owns 2 virtual CPU devices; together they form a 4-device
('env',) global mesh. Exercises the real multi-host API surface of
rmp_tpu.parallel.distributed: initialize -> global_env_mesh ->
local_batch_slice -> make_array_from_process_local_data -> sharded rollout
with cross-process metric reductions.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2"
                           ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def main():
    coordinator, num_procs, pid = (sys.argv[1], int(sys.argv[2]),
                                   int(sys.argv[3]))
    from rmp_tpu.parallel import distributed as D

    D.initialize(coordinator_address=coordinator, num_processes=num_procs,
                 process_id=pid)
    assert jax.process_count() == num_procs, jax.process_count()
    assert len(jax.devices()) == 2 * num_procs, len(jax.devices())

    from rmp_tpu import envs
    from rmp_tpu.parallel.mesh import ENV_AXIS, make_sharded_rollout

    env = envs.make("two_joint/01_target_rmp_only")
    env.resolve_method = "solve"

    mesh = D.global_env_mesh()
    global_batch = 8
    start, size = D.local_batch_slice(global_batch)
    assert size == global_batch // num_procs

    # every process builds only ITS slice of the global env batch
    keys = jax.random.split(jax.random.PRNGKey(0), global_batch)[
        start:start + size]
    local_states = jax.vmap(env.reset)(keys)
    sharding = NamedSharding(mesh, P(ENV_AXIS))
    states = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x), (global_batch,) + x.shape[1:]),
        local_states)

    rollout = make_sharded_rollout(env, n_ticks=2, mesh=mesh)
    final, metrics = rollout(states, env.gather_params())
    jax.block_until_ready(final.sim.q)
    assert final.sim.q.shape == (global_batch, env.model.n_q)
    vals = {k: float(v) for k, v in metrics.items()}
    assert all(np.isfinite(v) for v in vals.values()), vals
    print(f"worker {pid}: ok {vals}", flush=True)


if __name__ == "__main__":
    main()
