"""Fused tick mega-kernel vs the standard evaluation path."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

# ~7 min in interpreter mode; run with RMP_RUN_SLOW_TESTS=1
pytestmark = pytest.mark.skipif(
    os.environ.get("RMP_RUN_SLOW_TESTS") != "1",
    reason="slow interpret-mode kernel test (set RMP_RUN_SLOW_TESTS=1)")

from rmp_tpu import envs
from rmp_tpu.core import evaluate_policies
from rmp_tpu.sim.world import sense

rng = np.random.default_rng(13)


def _standard_qdd(env, q, qd, goal, obstacles):
    import dataclasses

    from rmp_tpu.sim.world import init_state
    sim = init_state(env.model, q=q, qd=qd, obstacles=obstacles, goal=goal)
    params = env.bind_params(env.gather_params(), sim, env.policies)
    _, _, ctx = sense(env.model, sim)
    ctxs = tuple(ctx.get(p.ctx_key) if p.ctx_key else None
                 for p in env.policies)
    return evaluate_policies(env.policies, q, qd, params, ctxs,
                             method="cholesky", derivatives="analytic")


def test_fused_tick_matches_standard_interpret():
    from rmp_tpu.ops import pallas_tick as pt

    env = envs.make("franka/06_cluttered_environment")
    assert pt.supports(env)

    B = pt.BLOCK
    n = env.model.n_q
    state = env.reset(jax.random.PRNGKey(0))
    obs = state.sim.obstacles
    K = obs.count

    qs = jnp.asarray(rng.uniform(-1.0, 1.0, (B, n)), jnp.float32)
    qds = jnp.asarray(rng.uniform(-0.8, 0.8, (B, n)), jnp.float32)
    goals = jnp.asarray(rng.uniform([0.2, -0.5, 0.2], [0.7, 0.5, 0.7],
                                    (B, 3)), jnp.float32)
    obs_p0 = jnp.broadcast_to(obs.p0[None], (B, K, 3))
    obs_p1 = jnp.broadcast_to(obs.p1[None], (B, K, 3))
    obs_r = jnp.broadcast_to(obs.radius[None], (B, K))

    fused = pt.make_fused_qdd(env)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused(qs, qds, goals, obs_p0, obs_p1, obs_r))

    # spot-check a handful of envs against the standard path
    for i in (0, 7, 100, 511):
        import rmp_tpu.sim.collision as C
        obstacles = C.ObstacleSet(obs_p0[i], obs_p1[i], obs_r[i])
        want = np.asarray(_standard_qdd(env, qs[i], qds[i], goals[i],
                                        obstacles))
        np.testing.assert_allclose(got[i], want, atol=2e-3,
                                   err_msg=f"env {i}")
