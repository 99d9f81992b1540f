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


def audit_collectives(compiled_hlo_text: str) -> dict:
    """Mechanically verify the zero-comms invariant on a compiled module.

    The env axis is embarrassingly parallel, so the compiled sharded rollout
    must contain NO data-moving collectives (all-gather / all-to-all /
    collective-permute / reduce-scatter) anywhere, and every all-reduce must
    produce only SCALARS — the final metric reductions. An all-reduce over a
    tensor with the env dimension would mean XLA silently resharded the
    rollout body (the failure mode this guards against; previously only
    stated in prose here).

    Returns {"all_reduce": n, "scalar_only": True} on success; raises
    AssertionError with the offending HLO lines otherwise. Works on
    `jitted.lower(...).compile().as_text()` output.
    """
    import re

    forbidden = ("all-gather", "all-to-all", "collective-permute",
                 "reduce-scatter")
    bad = [ln for ln in compiled_hlo_text.splitlines()
           if any(f" {op}" in ln or f"{op}(" in ln for op in forbidden)]
    assert not bad, (
        "data-moving collectives in the sharded rollout "
        "(env axis must stay embarrassingly parallel):\n" + "\n".join(bad))

    n_ar = 0
    for ln in compiled_hlo_text.splitlines():
        if "all-reduce" not in ln or "=" not in ln:
            continue
        n_ar += 1
        # result type(s) sit between '=' and the op name; every dims spec
        # there must be [] (scalar) — metric reductions only
        rtype = ln.split("=", 1)[1].split("all-reduce")[0]
        dims = re.findall(r"\[([0-9,]*)\]", rtype)
        assert dims and all(d == "" for d in dims), (
            f"non-scalar all-reduce in sharded rollout (silent body "
            f"resharding?): {ln.strip()}")
    return {"all_reduce": n_ar, "scalar_only": True}
