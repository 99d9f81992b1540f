"""TwoJointRobot experiment scenarios (reference experiments/two_joint_robot/).

Each builder returns an Env reproducing the corresponding reference script's
policy set, gains, scene, and resampling behavior, as a batched jittable env.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rmp_tpu import taskmaps as tm
from rmp_tpu.envs.base import Env, EnvState, bind_goal, env_state
from rmp_tpu.models import robots
from rmp_tpu.policies import v1
from rmp_tpu.sim.collision import cylinder_obstacle
from rmp_tpu.sim.world import init_state

MODEL = robots.two_joint_robot
EE = "link_23"
Q_LOW = robots.TWO_JOINT_Q_LIM_LOW
Q_HIGH = robots.TWO_JOINT_Q_LIM_HIGH


def _ee_pos_taskmap(model):
    return tm.chain(tm.fk_frame(model, EE), tm.to_position())


def _goal_bind(policies):
    binder = bind_goal(("target",))
    return lambda params, sim, pols: binder(params, sim, pols)


def _resample_goal(low, high):
    """on_solved: new uniform goal (reference 01_target_rmp_only.py:60-64)."""
    low = jnp.asarray(low, jnp.float32)
    high = jnp.asarray(high, jnp.float32)

    def on_solved(state: EnvState) -> EnvState:
        k, sub = jax.random.split(state.key)
        new_goal = jax.random.uniform(sub, (3,), minval=jnp.minimum(low, high),
                                      maxval=jnp.maximum(low, high))
        sim = dataclasses.replace(state.sim, goal=new_goal)
        return dataclasses.replace(state, sim=sim, key=k)
    return on_solved


def _resample_q(model):
    """on_solved: new random configuration, zero velocity (reference
    03_jointlimit_avoiding.py:49-51)."""
    low = jnp.asarray(model.q_lower)
    high = jnp.asarray(model.q_upper)

    def on_solved(state: EnvState) -> EnvState:
        k, sub = jax.random.split(state.key)
        q = jax.random.uniform(sub, low.shape, minval=low, maxval=high)
        sim = dataclasses.replace(state.sim, q=q, qd=jnp.zeros_like(q))
        return dataclasses.replace(state, sim=sim, key=k)
    return on_solved


def env_01_target_rmp_only() -> Env:
    """experiments/two_joint_robot/01_target_rmp_only.py."""
    model = MODEL()
    policies = (v1.target_policy(goal=[1.4, -1.4, 0.1],
                                 taskmap=_ee_pos_taskmap(model),
                                 alpha=0.1, beta=0.5, c=0.1, name="target"),)

    def reset(key):
        sim = init_state(model, q=robots.TWO_JOINT_Q_READY,
                         goal=[1.4, -1.4, 0.1])
        return env_state(sim, key)

    return Env(name="two_joint/01_target_rmp_only", model=model,
               policies=policies, reset=reset, ee_frame=model.frame_index(EE),
               solved_xy_only=True,
               bind_params=_goal_bind(policies),
               on_solved=_resample_goal([0.1, 0.1, 0.1], [1.4, -1.4, 0.1]))


def env_02_jointspace_biasing(bias_left: bool = True) -> Env:
    """experiments/two_joint_robot/02_jointspace_biasing.py — target + c-space
    bias toward elbow-left (q0 = [pi/2, 0]) or elbow-right ([-pi/2, 0])."""
    model = MODEL()
    q0 = [np.pi / 2, 0.0] if bias_left else [-np.pi / 2, 0.0]
    policies = (
        v1.target_policy(goal=[1.5, 0.0, 0.1], taskmap=_ee_pos_taskmap(model),
                         alpha=0.1, beta=0.5, c=0.1, name="target"),
        v1.configuration_space_biasing(q0=q0, gamma_p=0.01, gamma_d=0.1,
                                       name="ConfigurationSpaceBias"),
    )

    def reset(key):
        sim = init_state(model, q=robots.TWO_JOINT_Q_READY,
                         goal=[1.5, 0.0, 0.1])
        return env_state(sim, key)

    return Env(name="two_joint/02_jointspace_biasing", model=model,
               policies=policies, reset=reset, ee_frame=model.frame_index(EE),
               solved_xy_only=True, bind_params=_goal_bind(policies))


def env_03_jointlimit_avoiding() -> Env:
    """experiments/two_joint_robot/03_jointlimit_avoiding.py — limit-avoidance
    RMP alone drives the arm back toward mid-range from q = [pi/4, pi/4]."""
    model = MODEL()
    policies = (v1.joint_limit_avoidance(Q_LOW, Q_HIGH, gamma_p=0.3,
                                         gamma_d=1.0),)

    def reset(key):
        # goal = EE at mid-limits config (the experiment's is_solved check)
        from rmp_tpu.models import kinematics as K
        mid = 0.5 * (Q_LOW + Q_HIGH)
        goal = K.fk_frame(model, jnp.asarray(mid), model.frame_index(EE))[:3, 3]
        sim = init_state(model, q=[np.pi / 4, np.pi / 4], goal=goal)
        return env_state(sim, key)

    return Env(name="two_joint/03_jointlimit_avoiding", model=model,
               policies=policies, reset=reset, ee_frame=model.frame_index(EE),
               solved_xy_only=True, check_velocity=0.01,
               on_solved=_resample_q(model))


def env_04_driving_into_jointlimits() -> Env:
    """experiments/two_joint_robot/04_driving_into_jointlimits.py — a target
    RMP in configuration space pulls joint 1 to its lower limit while the
    limit-avoidance RMP resists."""
    model = MODEL()
    policies = (
        v1.target_policy(goal=[float(Q_LOW[0]), 0.0],
                         taskmap=tm.identity(), alpha=0.1, beta=1.0, c=0.1,
                         name="Target_RMP"),
        v1.joint_limit_avoidance(Q_LOW, Q_HIGH, gamma_p=0.2, gamma_d=1.0),
    )

    def reset(key):
        from rmp_tpu.models import kinematics as K
        mid = 0.5 * (Q_LOW + Q_HIGH)
        goal = K.fk_frame(model, jnp.asarray(mid), model.frame_index(EE))[:3, 3]
        sim = init_state(model, q=[-np.pi / 4, -np.pi / 4], goal=goal)
        return env_state(sim, key)

    return Env(name="two_joint/04_driving_into_jointlimits", model=model,
               policies=policies, reset=reset, ee_frame=model.frame_index(EE),
               solved_xy_only=True, check_velocity=0.001,
               on_solved=_resample_q(model))


def env_05_obstacle_avoidance() -> Env:
    """experiments/two_joint_robot/05_obstacle_avoidance.py — target RMP plus
    a per-frame v1 CollisionAvoidance on FK∘relative-offset∘position chains."""
    model = MODEL()
    from rmp_tpu.sim.data import PAIRS_KEY
    grouped = v1.collision_avoidance(
        taskmap=tm.chain(tm.multi_fk_frames(model, model.collision_frames),
                         tm.frames_relative_points()),
        eta_rep=0.1 * np.e, nu_rep=0.3, eta_damp=1.0, nu_damp=0.3, r=1.1,
        c=1e5, name="collision_avoidance")
    grouped.ctx_key = PAIRS_KEY
    policies = (
        v1.target_policy(goal=[1.4, -1.4, 0.1], taskmap=_ee_pos_taskmap(model),
                         alpha=0.1, beta=0.1, c=0.1, name="target"),
        # one grouped policy over all (collision frame x obstacle) pairs —
        # identical math to the reference's per-frame CollisionAvoidance list
        grouped,
    )

    obstacle = cylinder_obstacle([1.6, -0.8, 0.0], [0.0, 0.0, 0.0],
                                 radius=0.1, height=0.8)

    def reset(key):
        sim = init_state(model, q=robots.TWO_JOINT_Q_READY,
                         obstacles=obstacle, goal=[1.4, -1.4, 0.1])
        return env_state(sim, key)

    return Env(name="two_joint/05_obstacle_avoidance", model=model,
               policies=policies, reset=reset, ee_frame=model.frame_index(EE),
               solved_xy_only=True, bind_params=_goal_bind(policies))


def env_05_obstacle_avoidance_variant() -> Env:
    """The reference's '05_obstacle_avoidance copy.py' gain variant: stiffer
    target damping (beta 0.5), softer wide-radius collision damping
    (eta_damp 0.1, nu_damp 0.6, r 3)."""
    env = env_05_obstacle_avoidance()
    target, grouped = env.policies
    policies = (target.with_params(beta=0.5),
                grouped.with_params(eta_damp=0.1, nu_damp=0.6, r=3.0))
    return dataclasses.replace(
        env, policies=policies,
        name="two_joint/05_obstacle_avoidance_variant")
