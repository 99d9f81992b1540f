"""UR5 — third robot family through the generic pipeline (envs/ur5.py).

FK oracle: the UR5's zero-pose EE position is a well-known closed-form of
its link offsets (x = d4+d6... composed below from the spec's own constants,
checked against the independently-derived standard value)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rmp_tpu import envs
from rmp_tpu.envs.base import make_control_step
from rmp_tpu.models import kinematics as K
from rmp_tpu.models import robots


def test_ur5_fk_zero_pose():
    model = robots.ur5()
    assert model.n_q == 6
    T = K.fk_all(model, jnp.zeros(6))
    ee = np.asarray(T[model.frame_index(robots.UR5_EE_FRAME)][:3, 3])
    # standard UR5 zero pose: x = a2+a3 = 0.425+0.39225 = 0.81725,
    # y = d4+d6-0.1197+0.13585 = 0.093+0.0823+0.01615 = 0.19145,
    # z = d1-d5 = 0.089159-0.09465 = -0.005491
    np.testing.assert_allclose(ee, [0.81725, 0.19145, -0.005491], atol=1e-5)


def test_ur5_asset_roundtrip():
    from rmp_tpu.models.urdf import parse_urdf
    import os
    path = os.path.join(os.path.dirname(__file__), os.pardir, "assets",
                        "ur5.urdf")
    parsed = parse_urdf(path)
    spec = robots.ur5()
    assert parsed.frame_names == spec.frame_names
    np.testing.assert_allclose(parsed.T_constant, spec.T_constant, atol=1e-6)
    q = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, 6), jnp.float32)
    np.testing.assert_allclose(np.asarray(K.fk_all(parsed, q)),
                               np.asarray(K.fk_all(spec, q)), atol=1e-6)


@pytest.mark.slow
def test_ur5_target_reaching():
    env = envs.make("ur5/01_target_reaching")
    state = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(make_control_step(env))
    params = env.gather_params()
    solved = False
    for _ in range(300):
        state, aux = step(state, params)
        solved = solved or bool(aux["solved"])
        if solved:
            break
    assert solved, "UR5 did not reach the target"


@pytest.mark.slow
def test_ur5_obstacle_avoidance_keeps_clearance():
    from rmp_tpu.sim.collision import robot_obstacle_distances

    env = envs.make("ur5/02_obstacle_avoidance")
    state = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(make_control_step(env))
    params = env.gather_params()
    min_d = np.inf
    solved = False
    for _ in range(500):
        state, aux = step(state, params)
        T_all = K.fk_all(env.model, state.sim.q)
        _, _, _, d = robot_obstacle_distances(env.model, T_all,
                                              state.sim.obstacles)
        min_d = min(min_d, float(jnp.min(d)))
        solved = solved or bool(aux["solved"])
        if solved:
            break
    assert solved, "UR5 did not reach the goal around the obstacle"
    assert min_d > -0.01, f"UR5 penetrated the obstacle: {min_d}"
