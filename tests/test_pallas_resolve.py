"""Pallas fused pullback+resolve vs the jnp reference path.

Runs in interpreter mode on CPU (the TPU-compiled kernel is exercised by
bench/experiments on hardware)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rmp_tpu.ops.linalg import cholesky_solve_unrolled

rng = np.random.default_rng(11)


def _reference(J, W, v, ridge=1e-6):
    A = jnp.einsum("brn,brm->bnm", J, W)
    f = jnp.einsum("brn,br->bn", J, v)
    return cholesky_solve_unrolled(A, f, ridge=ridge)


def test_pallas_pullback_resolve_interpret():
    from jax.experimental.pallas import tpu as pltpu

    from rmp_tpu.ops import pallas_resolve as pr

    B, R, n = 256, 30, 9
    J = jnp.asarray(rng.normal(size=(B, R, n)), jnp.float32)
    M_diag = jnp.asarray(rng.uniform(0.1, 2.0, size=(B, R)), jnp.float32)
    W = J * M_diag[..., None]
    v = jnp.asarray(rng.normal(size=(B, R)), jnp.float32)

    want = np.asarray(_reference(J, W, v))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(pr.pullback_resolve(J, W, v))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_fused_rollout_matches_standard_interpret():
    """Full fused-resolve batched rollout (Pallas) == standard path."""
    from jax.experimental.pallas import tpu as pltpu

    from rmp_tpu import envs

    env = envs.make("franka/06_cluttered_environment")
    env.resolve_method = "cholesky"
    states = envs.make_batched_reset(env, 128)(jax.random.PRNGKey(0))
    params = env.gather_params()
    f1, _ = jax.jit(envs.make_batched_rollout(env, 2))(states, params)
    with pltpu.force_tpu_interpret_mode():
        f2, _ = envs.make_batched_rollout(env, 2, fused_resolve=True)(
            states, params)
    np.testing.assert_allclose(np.asarray(f1.sim.q), np.asarray(f2.sim.q),
                               atol=1e-3)
