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


@pytest.mark.slow
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


@pytest.mark.slow
def test_fused_rollout_matches_standard_interpret():
    """Full fused-resolve batched rollout (Pallas pivoted LU) == the
    per-env 'solve' path (both ridge-free; envs/base.py honors
    env.resolve_method in the fused step)."""
    from jax.experimental.pallas import tpu as pltpu

    from rmp_tpu import envs

    env = envs.make("franka/06_cluttered_environment")
    env.resolve_method = "solve"
    states = envs.make_batched_reset(env, 128)(jax.random.PRNGKey(0))
    params = env.gather_params()
    f1, _ = jax.jit(envs.make_batched_rollout(env, 2))(states, params)
    with pltpu.force_tpu_interpret_mode():
        f2, _ = envs.make_batched_rollout(env, 2, fused_resolve=True)(
            states, params)
    np.testing.assert_allclose(np.asarray(f1.sim.q), np.asarray(f2.sim.q),
                               atol=1e-3)


@pytest.mark.slow
def test_fused_rollout_honors_cholesky():
    """fused_resolve=True with a non-'solve' method must route through
    core.resolve (not the LU kernel): results match the per-env path."""
    import jax

    from rmp_tpu import envs

    env = envs.make("franka/06_cluttered_environment")
    env.resolve_method = "cholesky"
    states = envs.make_batched_reset(env, 8)(jax.random.PRNGKey(1))
    params = env.gather_params()
    f1, _ = jax.jit(envs.make_batched_rollout(env, 2))(states, params)
    f2, _ = jax.jit(envs.make_batched_rollout(env, 2, fused_resolve=True))(
        states, params)
    np.testing.assert_allclose(np.asarray(f1.sim.q), np.asarray(f2.sim.q),
                               atol=1e-4)


@pytest.mark.slow
def test_singular_metric_stays_finite():
    """An exactly singular combined metric (rank-deficient Gram) must give
    finite output from both LU implementations — regression for the
    back-substitution divide-by-unclamped-diagonal bug (ADVICE r1)."""
    from jax.experimental.pallas import tpu as pltpu

    from rmp_tpu.ops import pallas_resolve as pr
    from rmp_tpu.ops.linalg import lu_solve_unrolled

    n = 9
    # rank-1 A: guaranteed singular; plus an exactly-zero A for good measure
    u = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    A_sing = jnp.stack([jnp.outer(u, u), jnp.zeros((n, n), jnp.float32)])
    b = jnp.asarray(rng.normal(size=(2, n)), jnp.float32)
    x = np.asarray(lu_solve_unrolled(A_sing, b))
    assert np.isfinite(x).all()

    # same through the Pallas kernel: embed the singular system in a batch
    B, R = 128, n
    L = jnp.asarray(rng.normal(size=(B, R, n)), jnp.float32)
    # env 0: J rows = outer-product factor so J^T J is rank-1
    J = L.at[0].set(jnp.outer(jnp.ones(R), u) / np.sqrt(R))
    v = jnp.asarray(rng.normal(size=(B, R)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(pr.pullback_resolve(J, J, v, ridge=0.0))
    assert np.isfinite(got).all()


@pytest.mark.slow
def test_fused_rollout_bf16_blocks_close_to_f32():
    """fused_blocks_dtype='bf16' (halved producer->kernel HBM traffic,
    f32 arithmetic inside) tracks the f32 fused path to bf16 row
    precision over a short rollout."""
    from jax.experimental.pallas import tpu as pltpu

    from rmp_tpu import envs

    env = envs.make("franka/06_cluttered_environment")
    env.resolve_method = "solve"
    states = envs.make_batched_reset(env, 128)(jax.random.PRNGKey(0))
    params = env.gather_params()
    with pltpu.force_tpu_interpret_mode():
        f32, _ = envs.make_batched_rollout(env, 2, fused_resolve=True)(
            states, params)
        env.fused_blocks_dtype = "bf16"
        b16, _ = envs.make_batched_rollout(env, 2, fused_resolve=True)(
            states, params)
    q32, q16 = np.asarray(f32.sim.q), np.asarray(b16.sim.q)
    assert np.all(np.isfinite(q16))
    # bf16 has ~3 decimal digits; two ticks of integration keep the state
    # within ~1e-2 rad of the f32 trajectory (divergence grows with
    # horizon — this pins the boundary cast, not long-horizon parity)
    np.testing.assert_allclose(q16, q32, atol=1e-2)
    assert np.max(np.abs(q16 - q32)) > 0.0, "bf16 path identical to f32?"


def test_fused_blocks_dtype_validated():
    from rmp_tpu import envs
    from rmp_tpu.envs.base import make_batched_control_step

    env = envs.make("franka/06_cluttered_environment")
    env.fused_blocks_dtype = "bfloat16"   # typo'd value must not silently
    with pytest.raises(ValueError, match="fused_blocks_dtype"):
        make_batched_control_step(env)
