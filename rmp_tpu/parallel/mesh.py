"""Device mesh + sharded batched rollouts.

The workload's single parallelism axis is the environment batch (SURVEY.md §2
audit: the reference is 1 env / 1 process; there is no model to shard). The
TPU-native scaling recipe:
  * vmap within chip (thousands of envs per chip),
  * shard the env axis over a 1-D mesh ("env",) across ICI,
  * XLA collectives (psum/pmean) only for metric reductions — envs are
    embarrassingly parallel, so the steady-state step has NO cross-chip
    communication at all.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rmp_tpu.envs.base import Env, make_rollout

Array = jax.Array

ENV_AXIS = "env"


def make_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or given) devices with the 'env' axis."""
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (ENV_AXIS,))


def shard_env_batch(tree, mesh: Mesh):
    """Place a batched EnvState/pytree with the leading axis sharded on
    ('env',) — XLA partitions every per-env computation with zero comms."""
    sharding = NamedSharding(mesh, P(ENV_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def make_sharded_rollout(env: Env, n_ticks: int, mesh: Mesh,
                         collect_aux: bool = False) -> Callable:
    """jit-compiled sharded batched rollout.

    fn(batched_state, params) -> (batched_final_state, metrics) where metrics
    are cross-device pmean/psum reductions (success rate, mean |q̈|).
    in_shardings pin the env axis to the mesh; XLA inserts no collectives in
    the rollout body (envs are independent) and only an all-reduce for the
    final metrics.
    """
    rollout = make_rollout(env, n_ticks)

    def run(states, params):
        final, aux = jax.vmap(rollout, in_axes=(0, None))(states, params)
        solved_any = jnp.any(aux["solved"], axis=1)         # (B_local,)
        metrics = dict(
            success_rate=jnp.mean(solved_any.astype(jnp.float32)),
            goals_reached=jnp.mean(final.solved_count.astype(jnp.float32)),
            mean_abs_qdd=jnp.mean(jnp.abs(aux["qdd"])),
        )
        if collect_aux:
            return final, metrics, aux
        return final, metrics

    state_sharding = NamedSharding(mesh, P(ENV_AXIS))
    return jax.jit(
        run,
        in_shardings=(state_sharding, None),
        out_shardings=None,
    )


def pmean_metrics(metrics: dict) -> dict:
    """Explicit cross-device mean for metrics computed under shard_map."""
    return jax.tree.map(lambda x: jax.lax.pmean(x, ENV_AXIS), metrics)
