"""UR5 scenarios — third robot family, demonstrating that every layer
(spec table -> KinematicModel -> FK/derivatives -> policies -> envs ->
batched/sharded rollouts) is robot-generic, beyond the two reference robots.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from rmp_tpu import taskmaps as tm
from rmp_tpu.envs.base import Env, EnvState, bind_goal, env_state
from rmp_tpu.models import robots
from rmp_tpu.policies import v1, v2
from rmp_tpu.sim.collision import cylinder_obstacle
from rmp_tpu.sim.world import init_state

EE = robots.UR5_EE_FRAME


def _ee_pos_taskmap(model):
    return tm.chain(tm.fk_frame(model, EE), tm.to_position())


def env_01_target_reaching() -> Env:
    """Target reaching with the v2 stack (attractor + velocity cap +
    damping), uniform goal resampling on success."""
    model = robots.ur5()
    policies = (
        v2.target_attractor(
            goal=[0.5, 0.3, 0.4], taskmap=_ee_pos_taskmap(model),
            accel_p_gain=0.3, accel_d_gain=0.6, accel_norm_eps=0.075,
            metric_alpha_length_scale=0.05, min_metric_alpha=0.03,
            max_metric_scalar=1, min_metric_scalar=0.5,
            proximity_metric_boost_scalar=1.0,
            proximity_metric_boost_length_scale=0.02, name="attractor"),
        v2.joint_velocity_cap(max_velocity=1.0, velocity_damping_region=0.3,
                              damping_gain=5.0, metric_weight=0.05),
        v2.joint_damping(accel_d_gain=1, metric_scalar=0.005, inertia=0.3),
    )

    def on_solved(state: EnvState) -> EnvState:
        k, sub = jax.random.split(state.key)
        goal = jax.random.uniform(sub, (3,),
                                  minval=jnp.asarray([0.3, -0.5, 0.2]),
                                  maxval=jnp.asarray([0.6, 0.5, 0.6]))
        sim = dataclasses.replace(state.sim, goal=goal)
        return dataclasses.replace(state, sim=sim, key=k)

    def reset(key):
        sim = init_state(model, q=robots.UR5_Q_READY, goal=[0.5, 0.3, 0.4])
        return env_state(sim, key)

    binder = bind_goal(("attractor",))
    return Env(name="ur5/01_target_reaching", model=model, policies=policies,
               reset=reset, ee_frame=model.frame_index(EE),
               bind_params=lambda p, s, pols: binder(p, s, pols),
               on_solved=on_solved, resolve_method="solve")


def env_02_obstacle_avoidance() -> Env:
    """Reach past a vertical cylinder with per-frame v1 CollisionAvoidance
    (same policy construction as two_joint/05, on the third robot)."""
    from rmp_tpu.sim.data import PAIRS_KEY

    model = robots.ur5()
    grouped = v1.collision_avoidance(
        taskmap=tm.chain(tm.multi_fk_frames(model, model.collision_frames),
                         tm.frames_relative_points()),
        eta_rep=0.1 * 2.718, nu_rep=0.3, eta_damp=0.5, nu_damp=0.3, r=0.3,
        c=1e5, name="collision_avoidance")
    grouped.ctx_key = PAIRS_KEY
    policies = (
        v1.target_policy(goal=[0.55, 0.35, 0.3], taskmap=_ee_pos_taskmap(model),
                         alpha=0.3, beta=0.5, c=0.1, name="target"),
        v2.joint_damping(accel_d_gain=1, metric_scalar=0.005, inertia=0.3),
        grouped,
    )
    obstacle = cylinder_obstacle([0.45, 0.0, 0.2], [0.0, 0.0, 0.0],
                                 radius=0.04, height=0.5)

    def reset(key):
        sim = init_state(model, q=robots.UR5_Q_READY, obstacles=obstacle,
                         goal=[0.55, 0.35, 0.3])
        return env_state(sim, key)

    binder = bind_goal(("target",))
    return Env(name="ur5/02_obstacle_avoidance", model=model,
               policies=policies, reset=reset,
               ee_frame=model.frame_index(EE),
               bind_params=lambda p, s, pols: binder(p, s, pols),
               resolve_method="solve", solved_tol=0.03)
