"""Franka Panda experiment scenarios (reference experiments/franka_panda/).

06_cluttered_environment is the flagship demo (and the benchmark workload,
BASELINE.md): 7 cylinders, v2 policy stack, 6 sequential goals.

02/03 used the reference's removed legacy `_RmpCore` API and no longer run as
written there (SURVEY.md §6); here they are provided as working equivalents:
02 drives through an obstacle with collision policies disabled (failure
probe), 03 runs self-collision avoidance from the analytic self-distance
queries.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rmp_tpu import taskmaps as tm
from rmp_tpu.envs import maneuver as mv
from rmp_tpu.envs.base import (Env, EnvState, bind_goal, env_state,
                               take_row)
from rmp_tpu.models import kinematics as K
from rmp_tpu.models import robots
from rmp_tpu.models.ik import inverse_kinematics
from rmp_tpu.policies import v1, v2
from rmp_tpu.sim.collision import (ObstacleSet, cylinder_obstacle,
                                   robot_self_distances, self_collision_pairs)
from rmp_tpu.sim.world import init_state

MODEL = robots.franka_panda
EE = robots.PANDA_EE_FRAME
Q_READY = robots.PANDA_Q_READY


def _ee_pos_taskmap(model):
    return tm.chain(tm.fk_frame(model, EE), tm.to_position())


def _goal_bind():
    binder = bind_goal(("target", "attractor"))
    return lambda params, sim, pols: binder(params, sim, pols)


def _resample_goal(low, high):
    low = jnp.asarray(low, jnp.float32)
    high = jnp.asarray(high, jnp.float32)

    def on_solved(state: EnvState) -> EnvState:
        k, sub = jax.random.split(state.key)
        new_goal = jax.random.uniform(sub, (3,), minval=low, maxval=high)
        sim = dataclasses.replace(state.sim, goal=new_goal)
        return dataclasses.replace(state, sim=sim, key=k)
    return on_solved


def _v2_policy_stack(model, goal, attractor_p_gain, attractor_d_gain,
                     with_cspace_bias: bool, max_velocity: float = 0.5):
    """The shared v2 stack of experiments 05/06 (05_obstacle_avoidance.py:50-67,
    06_cluttered_environment.py:66-95)."""
    policies = [
        v2.target_attractor(
            goal=goal, taskmap=_ee_pos_taskmap(model),
            accel_p_gain=attractor_p_gain, accel_d_gain=attractor_d_gain,
            accel_norm_eps=0.075, metric_alpha_length_scale=0.05,
            min_metric_alpha=0.03, max_metric_scalar=1, min_metric_scalar=0.5,
            proximity_metric_boost_scalar=1.0,
            proximity_metric_boost_length_scale=0.02, name="attractor"),
        v2.joint_velocity_cap(max_velocity=max_velocity,
                              velocity_damping_region=0.15,
                              damping_gain=5.0, metric_weight=0.05),
        v2.joint_damping(accel_d_gain=1, metric_scalar=0.005, inertia=0.3),
    ]
    if with_cspace_bias:
        policies.append(v2.cspace_biasing(
            goal=[0.0, -0.9, 0.0, -2.8, 0.0, 2.0, 0.7853981633974483, 0.02,
                  0.02],
            metric_scalar=0.005, position_gain=1, damping_gain=2,
            robust_position_term_thresh=0.5, inertia=0.0001))
    return policies


def _obstacle_policies(model, grouped: bool = True, frames=None,
                       name: str = "collision_avoidance",
                       ctx_key: str | None = None):
    """ObstacleAvoidance over every collision frame on FK∘distance chains
    (05_obstacle_avoidance.py:69-92).

    grouped=True (default): ONE multi-frame policy covering all collision
    links x obstacle pairs — mathematically identical to the reference's
    per-frame policy list (the pullback sums over pairs either way) but
    emits a single fused computation. grouped=False reproduces the
    reference's per-frame policy structure.

    frames/name/ctx_key: optional collision-frame SUBSET for the grouped
    policy (dual_panda splits obstacle avoidance per arm so the push
    relax applies only to the pushing arm, envs/dual.py) — the context
    entry under ctx_key must then carry that subset's (L', K, ...) rows.
    """
    kw = dict(margin=0.0, damping_gain=50, damping_std_dev=0.04,
              damping_robustness_eps=0.01,
              damping_velocity_gate_length_scale=0.01, repulsion_gain=800,
              repulsion_std_dev=0.01, metric_modulation_radius=0.5,
              metric_scalar=1, metric_exploder_std_dev=0.02,
              metric_exploder_eps=0.001)
    if grouped:
        from rmp_tpu.sim.data import PAIRS_KEY
        taskmap = tm.chain(
            tm.multi_fk_frames(model, model.collision_frames
                               if frames is None else frames),
            tm.frames_to_point_distance())
        pol = v2.obstacle_avoidance(taskmap=taskmap, name=name, **kw)
        pol.ctx_key = PAIRS_KEY if ctx_key is None else ctx_key
        return [pol]
    out = []
    for i in model.collision_frames:
        frame = model.frame_names[i]
        taskmap = tm.chain(tm.fk_frame(model, frame),
                           tm.frame_to_point_distance())
        pol = v2.obstacle_avoidance(
            taskmap=taskmap, name=f"collision_avoidance_for_{frame}", **kw)
        pol.ctx_key = frame
        out.append(pol)
    return out


def env_01_target_rmp_only() -> Env:
    """experiments/franka_panda/01_target_rmp_only.py."""
    model = MODEL()
    policies = (v1.target_policy(goal=[0.6, 0.0, 0.4],
                                 taskmap=_ee_pos_taskmap(model),
                                 alpha=0.1, beta=0.5, c=0.1, name="target"),)

    def reset(key):
        sim = init_state(model, q=Q_READY, goal=[0.6, 0.0, 0.4])
        return env_state(sim, key)

    return Env(name="franka/01_target_rmp_only", model=model,
               policies=policies, reset=reset, ee_frame=model.frame_index(EE),
               bind_params=_goal_bind(),
               on_solved=_resample_goal([0.3, -0.7, 0.3], [0.7, 0.7, 0.7]))


def env_02_provoke_collision(contact: bool = True) -> Env:
    """Failure probe: target straight through a cylinder with NO obstacle
    RMPs (working equivalent of the bitrotted 02_provoce_collision.py).
    With contact=True (default) the arm physically collides with the
    cylinder — penalty contact forces block it (sim/contact.py) — instead of
    ghosting through."""
    model = MODEL()
    policies = (v1.target_policy(goal=[0.0, -0.5, 0.5],
                                 taskmap=_ee_pos_taskmap(model),
                                 alpha=0.1, beta=0.5, c=0.1, name="target"),)
    # radius 0.05 (not the 05-scene's 0.025): with the mesh-fitted collision
    # capsules the commanded path only grazes a thin cylinder — the failure
    # probe needs the obstacle genuinely in the way
    obstacle = cylinder_obstacle([0.3, -0.3, 0.5], [0.2, 0.0, 0.0],
                                 radius=0.05, height=0.3)

    def reset(key):
        sim = init_state(model, q=Q_READY, obstacles=obstacle,
                         goal=[0.0, -0.5, 0.5])
        return env_state(sim, key)

    return Env(name="franka/02_provoke_collision", model=model,
               policies=policies, reset=reset, ee_frame=model.frame_index(EE),
               bind_params=_goal_bind(), contact=contact, max_qdd=200.0)


def env_03_self_avoidance() -> Env:
    """Self-collision avoidance from analytic self-distance queries (working
    equivalent of the bitrotted 03_self_avoidance.py): per-frame v1
    CollisionAvoidance fed by link-link closest points."""
    model = MODEL()
    # drop pairs already closer than 12 cm at the ready pose (fingers,
    # hand-vs-wrist): with mesh-fitted capsules their constant sub-r
    # proximity exerted a permanent repulsion bias that destabilized
    # target tracking (SRDF-style structural exclusion)
    pairs = self_collision_pairs(model, n_neighbors=3, exclude_below=0.12,
                                 q_ref=Q_READY)
    # group pairs by their first frame -> per-frame pair context
    frames = sorted({a for a, _ in pairs})
    policies = [
        v1.target_policy(goal=[0.6, 0.0, 0.4], taskmap=_ee_pos_taskmap(model),
                         alpha=0.1, beta=0.5, c=0.1, name="target"),
        v2.joint_damping(accel_d_gain=1, metric_scalar=0.005, inertia=0.3),
    ]
    for f in frames:
        frame = model.frame_names[f]
        taskmap = tm.chain(tm.fk_frame(model, frame), tm.relative_points())
        # r=0.15 (not the 2-DOF scene's 0.4): on a 0.8 m arm most link pairs
        # sit permanently within 0.4 m of each other, so a wide radius turns
        # self-avoidance into a constant bias that destabilizes tracking —
        # repulsion should fire only on genuine approach
        pol = v1.collision_avoidance(
            taskmap=taskmap, eta_rep=0.1 * np.e, nu_rep=0.3, eta_damp=0.5,
            nu_damp=0.3, r=0.15, c=1e5, name=f"self_avoidance_for_{frame}")
        pol.ctx_key = frame
        policies.append(pol)
    policies = tuple(policies)

    from rmp_tpu.models import kinematics as K
    from rmp_tpu.ops import geom

    def context_fn(model_, sim, T_all=None):
        if T_all is None:
            T_all = K.fk_all(model_, sim.q)
        if env.collision_geometry == "hull":
            from rmp_tpu.sim.collision import robot_self_distances_hull
            pos_a, pos_b, normal, dist = robot_self_distances_hull(
                model_, T_all, pairs)
        else:
            pos_a, pos_b, normal, dist = robot_self_distances(model_, T_all,
                                                              pairs)
        ctx = {}
        for f in frames:
            rows = [i for i, (a, _) in enumerate(pairs) if a == f]
            idx = jnp.asarray(rows)
            T = T_all[f]
            rel = geom.mv(T[:3, :3].T, pos_a[idx] - T[:3, 3])
            ctx[model_.frame_names[f]] = dict(
                pos_on_link=pos_a[idx], pos_on_obstacle=pos_b[idx],
                normal=normal[idx], distance=dist[idx],
                relative_position=rel, mask=jnp.ones_like(dist[idx]))
        return ctx

    def reset(key):
        sim = init_state(model, q=Q_READY, goal=[0.6, 0.0, 0.4])
        return env_state(sim, key)

    # context_fn closes over the env so post-construction
    # env.collision_geometry = 'hull' switches the self-distance queries too
    env = Env(name="franka/03_self_avoidance", model=model,
              policies=policies, reset=reset, ee_frame=model.frame_index(EE),
              bind_params=_goal_bind(), context_fn=context_fn,
              on_solved=_resample_goal([0.3, -0.7, 0.3], [0.7, 0.7, 0.7]))
    return env


def env_04_nullspace_control() -> Env:
    """experiments/franka_panda/04_nullspace_control.py — target + c-space
    biasing resolves redundancy; start pose from IK at the goal."""
    model = MODEL()
    policies = (
        v1.target_policy(goal=[0.6, 0.0, 0.5], taskmap=_ee_pos_taskmap(model),
                         alpha=0.1, beta=1.0, c=0.1, name="target"),
        v1.configuration_space_biasing(
            q0=[np.pi / 2, -0.05, 0, -2.01, 0, 2.22, 0.79, 0.02, 0.02],
            gamma_p=0.01, gamma_d=0.1, name="jointspace_biasing", w=0.05),
    )

    from scipy.spatial.transform import Rotation
    quat = Rotation.from_euler(
        "xyz", [np.pi / 16, np.pi / 16, 0]).as_quat().astype(np.float32)
    q_start = inverse_kinematics(model, EE, jnp.asarray([0.6, 0.0, 0.5]),
                                 target_orientation_quat=jnp.asarray(quat),
                                 q_init=jnp.asarray(Q_READY))

    def reset(key):
        sim = init_state(model, q=q_start, goal=[0.6, 0.0, 0.5])
        return env_state(sim, key)

    return Env(name="franka/04_nullspace_control", model=model,
               policies=policies, reset=reset, ee_frame=model.frame_index(EE),
               bind_params=_goal_bind())


def env_05_obstacle_avoidance() -> Env:
    """experiments/franka_panda/05_obstacle_avoidance.py — v2 stack + one
    tilted cylinder."""
    model = MODEL()
    policies = tuple(
        _v2_policy_stack(model, goal=[0.0, -0.5, 0.5], attractor_p_gain=0.1,
                         attractor_d_gain=1.0, with_cspace_bias=False)
        + _obstacle_policies(model))
    obstacle = cylinder_obstacle([0.3, -0.3, 0.5], [0.2, 0.0, 0.0],
                                 radius=0.025, height=0.3)

    def reset(key):
        sim = init_state(model, q=Q_READY, obstacles=obstacle,
                         goal=[0.0, -0.5, 0.5])
        return env_state(sim, key)

    return Env(name="franka/05_obstacle_avoidance", model=model,
               policies=policies, reset=reset, ee_frame=model.frame_index(EE),
               bind_params=_goal_bind())


CLUTTERED_GOALS = np.array(
    [[0.2, -0.2, 0.5],
     [0.5, -0.4, 0.5],
     [0.6, -0.2, 0.7],
     [0.6, 0.0, 0.3],
     [0.4, 0.55, 0.65],
     [0.65, 0.35, 0.65]], dtype=np.float32)   # 06_cluttered_environment.py


def cluttered_obstacles() -> ObstacleSet:
    """The 7 cylinders of 06_cluttered_environment.py:37-52."""
    cyl = [
        ([0.35, -0.2, 0.55], [0.1, 0, 0], 0.025, 0.2),
        ([0.1, -0.4, 0.125], [0.1, 0, 0], 0.025, 0.3),
        ([0.33, -0.3, 0.7], [-1.7, 0.7, 0], 0.025, 0.3),
        ([0.55, 0.25, 0.5], [0.1, 0, 0], 0.025, 0.3),
        ([0.8, 0.25, 0.3], [0.1, 0, 0], 0.025, 0.3),
        ([0.5, 0.4, 0.31], [3.14 / 2, 0, 0], 0.025, 0.3),
        ([0.45, 0.1, 0.11], [3.14 / 2, 0, 0], 0.025, 0.3),
    ]
    return ObstacleSet.of(*[cylinder_obstacle(p, o, r, h)
                            for p, o, r, h in cyl])


def env_pose_target() -> Env:
    """Position + orientation control: the EE moves to a new position while
    HOLDING its initial orientation, via a second attractor on the 6D
    rotation taskmap (orientation taskmaps exist in the reference but no
    experiment exercises them; its quaternion map is stubbed)."""
    from rmp_tpu.models import kinematics as K
    from rmp_tpu.ops import geom

    model = MODEL()
    ee = model.frame_index(EE)
    T0 = K.fk_frame(model, jnp.asarray(Q_READY), ee)
    r6_goal = jnp.concatenate([T0[:3, 0], T0[:3, 1]])

    policies = (
        v1.target_policy(goal=[0.45, 0.3, 0.5],
                         taskmap=_ee_pos_taskmap(model),
                         alpha=0.15, beta=0.6, c=0.1, name="target"),
        v1.target_policy(goal=r6_goal,
                         taskmap=tm.chain(tm.fk_frame(model, EE),
                                          tm.to_rotation6()),
                         alpha=0.4, beta=0.8, c=0.1, name="orientation_hold"),
        v2.joint_damping(accel_d_gain=1, metric_scalar=0.005, inertia=0.3),
    )

    def reset(key):
        sim = init_state(model, q=Q_READY, goal=[0.45, 0.3, 0.5])
        return env_state(sim, key)

    return Env(name="franka/pose_target", model=model, policies=policies,
               reset=reset, ee_frame=ee, bind_params=_goal_bind(),
               solved_tol=0.03)


def bucket_capacity(n: int, buckets=(8, 16)) -> int:
    """Smallest standard capacity bucket holding n obstacles (VERDICT r4
    #8): randomized envs pad every scene to a bucket by DEFAULT, so
    interactive scene edits and sweeps over obstacle counts (within one
    bucket) share a single compiled program end-to-end — the reference
    Datamanager's no-retrace property (data_management.py:8-17)."""
    for b in buckets:
        if n <= b:
            return b
    return n


def env_randomized_cluttered(n_obstacles: int = 7,
                             obstacle_capacity: int | None = "auto") -> Env:
    """Domain-randomized cluttered scenes: every env draws its own obstacle
    set, initial robot jitter, and goal from the reference's randomization
    spaces (simulation.py:494-548) — obstacle poses/sizes are traced state,
    so the whole randomized batch shares one compiled program.

    obstacle_capacity: pad every scene to this fixed K with inert far
    obstacles (sim/collision.pad_obstacles) so instances of this env built
    with DIFFERENT n_obstacles (within one capacity) share a jit cache
    entry — the reference Datamanager's no-retrace property. "auto"
    (default, r5) picks the 8/16 bucket holding n_obstacles; None keeps
    K = n_obstacles (the pre-r5 exact-shape behavior).

    STUCK-ESCAPE MANEUVER (in-graph, per env): reactive RMPs have local
    minima, and the only pre-r4 escape was the 80-tick goal-timeout
    resample — which by definition can't rescue the FIRST goal (22% of
    first goals were lost this way, reports/eval_randomized.json). Now,
    after ESC_TRIGGER ticks without progress the attractor is bound to a
    DETOUR waypoint for MAN_TICKS: retreat from the goal plus a random
    tangential offset, re-approaching from a different side each attempt
    (independent retry chances, keyed off the env's PRNG). sim.goal is
    never touched — the solved predicate and first-goal accounting stay
    exact; after MAN_BUDGET failed escapes the goal timeout remains the
    last resort. Trigger resets goal_best so genuine re-approach progress
    is measured from scratch."""
    from rmp_tpu.sim import randomizer as rnd

    if obstacle_capacity == "auto":
        obstacle_capacity = bucket_capacity(n_obstacles)
    model = MODEL()
    ee_idx = model.frame_index(EE)

    # Escape/push knobs live in EnvState.scratch["cfg"] as TRACED per-env
    # scalars (defaults below): the compiled rollout is knob-independent,
    # so sweeps override cfg leaves after reset — even with DIFFERENT
    # configs across envs of one batch — without recompiling (the same
    # one-compile property sweep_randomized.py exploits for gains).
    # Shared substrate + unified knob vocabulary: envs/maneuver.py (r5).
    CFG = dict(
        esc_trigger=40.0,  # no-progress ticks before a detour fires.
        #                    35 -> 40 (r5 rounds 11-12): later detours give
        #                    the plain policy longer before spending the
        #                    budget — the trigger is the first-vs-overall
        #                    dial (t35 83.2/89.7, t40 84.1/89.0, t45
        #                    84.4/88.4 paired at er10+p5); 40 maximizes
        #                    the sum.
        man_ticks=22.0,    # detour duration (counter frozen meanwhile)
        man_budget=2.0,    # detours; FIRST GOAL ONLY by default (below)
        man_first_only=1.0,  # maneuvers only before the first goal event
        #                    (r4's timer-parked detours on keep-busy goals
        #                    measured overall 92.9% -> 84%; with r5's
        #                    arrival-ended detours the same experiment is
        #                    ~neutral — round 13: allgoals_b2 84.1/88.8 vs
        #                    shipped 84.1/89.0 — so late escapes are gated
        #                    by the dedicated budget below instead)
        man_budget_late=0.0,  # detour budget per KEEP-BUSY goal when
        #                    man_first_only=1 (0 = the old hard gate).
        #                    Splitting the budget exists because one
        #                    shared budget starves the first goal (round
        #                    13: allgoals_b1 79.9/91.5 — +2.5 overall for
        #                    -4.2 first).
        esc_back=0.15,     # m, retreat component (away from the goal)
        esc_side=0.30,     # m, sideways component (new approach side)
        esc_axis1=1.0,     # detour 1 slides along the blocking cylinder's
        #                    axis (0.0: random tangent like detour 2)
        esc_cand=1.0,      # 1: pick the detour waypoint by SCORING four
        #                    candidates (+-obstacle axis, +-random tangent)
        #                    on clearance-at-waypoint minus goal detour;
        #                    0: the guessed direction (axis toward goal)
        man_arrive=1.0,    # 1: end a detour as soon as the EE reaches the
        #                    waypoint (within 6 cm) instead of parking out
        #                    the timer
        esc_cspace=1.0,    # scale the cspace_target policy's metric and
        #                    position gain by this DURING detours.
        #                    Toward q_ready (esc_qspace=0) this was
        #                    paired-measured MONOTONICALLY WORSE (x5:
        #                    83.5->83.5, x20: 80.0, x60: 78.8 first-goal)
        #                    — the ready-pose pull fights the detour
        #                    waypoint. r5: esc_qspace=1 re-aims it at an
        #                    IK solution CONSISTENT with the waypoint.
        esc_qspace=0.0,    # q-space detour mode, attacking the 58% of
        #                    residual failures that are >=10 cm WEDGED
        #                    CONFIGURATIONS EE-space detours can't unwedge
        #                    (VERDICT r4 #2):
        #                    1: bind the cspace policy's goal to a DLS-IK
        #                       configuration whose EE sits at the detour
        #                       waypoint (computed at trigger). Paired-
        #                       measured FLAT-to-NEGATIVE (r5 sweep round
        #                       8: c5 83.2, c15 81.4, c40 82.5 vs 83.1
        #                       baseline) — IK re-posing guesses a
        #                       configuration that may itself be blocked.
        #                    2: REVERSE-OUT — detour to the arm's OWN
        #                       configuration from ~30 ticks ago (scratch
        #                       q_hist ring): both the attractor (at its
        #                       EE position) and the cspace policy (at
        #                       q_past) pull back along a path that was
        #                       FEASIBLE by construction, then the goal
        #                       chase resumes from the unwedged pose.
        esc_gate=999.0,    # m: detour only when the env has already been
        #                    this close. Paired-swept: every gate value
        #                    (0.15/0.20/0.25) traded ~1.5 first-goal pts
        #                    for ~+1 overall — far-blocked detours rescue
        #                    more than expected. Disabled by default.
        timeout=80.0,      # no-progress ticks before the goal resamples
        timeout_spent=50.0,  # faster resample once the budget is spent (a
        #                      goal that survived two detours is hopeless —
        #                      don't also make it wait out the full window)
        # FINAL-PUSH boost: 28.5% of first-goal failures measured a
        # closest approach under 4 cm (another 25% under 10 cm) —
        # near-miss FORCE EQUILIBRIA where the attractor pull balances
        # obstacle repulsion just outside the 2 cm solve tolerance (the
        # reference's own criterion, 06_cluttered_environment.py:128), not
        # deep local minima. When the env has been close (goal_best <
        # push_near) and stalls, scale the attractor gains up to shift the
        # equilibrium inward; any 1 cm of progress resets the window and
        # the boost disengages. Fires before the detour trigger, so near
        # stalls try the push first and detours take over only if it fails.
        push_trigger=20.0,
        push_near=0.08,    # m, closest-approach gate
        push_boost=3.0,    # attractor p-gain scale (d-gain scales by sqrt)
        push_latch=0.0,    # 1: once engaged, the push STAYS on until a
        #                    detour/goal event. Paired-measured NO GAIN
        #                    over the transient variant (81.1 vs 81.6
        #                    first-goal), kept as a knob.
        push_metric=1.0,   # attractor metric-scalar scale during the push.
        #                    Paired-measured no gain (x3: 81.1, x5: 81.2
        #                    vs x1: 81.6); kept as a knob.
        push_relax=4.0,    # divide the OBSTACLE policies' repulsion_gain
        #                    and metric_scalar by this during the push:
        #                    the near-goal stall is an equilibrium against
        #                    the obstacle metric's 1/d^2 exploder, which
        #                    no attractor boost can outweigh — but the
        #                    goal region is sampled >=5 cm clear, so
        #                    trusting it briefly is safe (penetration
        #                    tracked by the sweep).
        push_relax_metric=0.0,  # 1: relax the metric_scalar ONLY, keep
        #                    repulsion_gain at full force (blend weight
        #                    yields, the barrier stays — penetration
        #                    control, dual_panda pattern).
        esc_relax=10.0,    # divide the obstacle policy's metric_scalar by
        #                    this DURING detours (repulsion force kept):
        #                    lets the detour pull outvote the 1/d^2 metric
        #                    wall so a wedged link can slide along the
        #                    barrier. Alone it is flat (r11: 83.2/89.7 at
        #                    x10 vs 83.1/89.5); combined with t40+p5 it is
        #                    part of the shipped frontier point
        #                    84.1/89.0/0.85 (r12).
        obs_margin=0.005,  # m, ADDED to the obstacle policy's margin
        #                    (negative = the policy treats obstacles as
        #                    that much FARTHER). r5 round-10 probe of the
        #                    capsule-padding hypothesis (VERDICT r4 #2
        #                    lever b): NEGATIVE margins bought +0.4..1.0
        #                    first-goal at 2-3x measured penetration —
        #                    the ~1 cm capsule padding is NOT the wedged-
        #                    configuration cause (the 47-primitive FINE
        #                    capsule table measured equally flat:
        #                    83.2/89.3/1.29). POSITIVE +5 mm ships as the
        #                    default: pen 1.07 -> 0.76 at unchanged
        #                    success in isolation (r10), 0.85 in the
        #                    shipped t40+er10 combination (r12).
    )
    _WS_LO = np.asarray([-0.85, -0.85, 0.15], np.float32)
    _WS_HI = np.asarray([0.85, 0.85, 0.95], np.float32)

    def init_scratch(q0=None):
        zero = jnp.zeros((), jnp.int32)
        q0 = jnp.asarray(Q_READY if q0 is None else q0, jnp.float32)
        return dict(man_ticks=zero, man_count=zero,
                    wp=jnp.zeros(3, jnp.float32),
                    q_wp=q0,
                    # reverse-out ring (esc_qspace=2): slot 0 is ~S ticks
                    # old, the last slot ~S*H ticks old (S=8, H=4)
                    q_hist=jnp.tile(q0[None], (4, 1)),
                    push_on=jnp.zeros((), jnp.bool_),
                    cfg=mv.cfg_scratch(CFG))

    def _ik_toward(q, target):
        """Few-step position-only DLS from q toward EE-at-target: the
        detour's CONFIGURATION waypoint. Starting at the wedged q keeps
        the solution on this env's branch of the redundancy (the full
        200-iteration solver in models/ik.py is built for cold starts);
        8 steps reach ~mm on a 30 cm move and the result only steers a
        low-gain c-space bias, not the EE tracking itself."""
        def err(qq):
            return target - K.fk_frame(model, qq, ee_idx)[:3, 3]

        def body(_, qq):
            e = err(qq)
            J = jax.jacfwd(err)(qq)                    # (3, n), J = -dfk/dq
            A = J @ J.T + 1e-4 * jnp.eye(3, dtype=jnp.float32)
            qq = qq - 0.5 * (J.T @ jnp.linalg.solve(A, e))
            return jnp.clip(qq, jnp.asarray(model.q_lower),
                            jnp.asarray(model.q_upper))
        return jax.lax.fori_loop(0, 8, body, q)

    def pre_tick(state: EnvState) -> EnvState:
        """Escape trigger + waypoint choice. FIRST GOAL ONLY by default
        (man_first_only): escapes trade horizon time for rescue chances,
        which is the right trade for the env's primary goal but measured
        NET-NEGATIVE for the keep-busy goals after a timeout resample
        (escapes on every goal: overall success 92.9% -> 84%, the delayed
        resamples cost more later-goal solves than the escapes rescued).
        Detour 1 slides ALONG the blocking cylinder's axis (the shortest
        way around a cylinder; sign toward the goal), detour 2 retries
        with a random tangent. Substrate: envs/maneuver.py."""
        sc = state.scratch
        cfg = sc["cfg"]
        trigger = ((state.no_progress >= cfg["esc_trigger"])
                   & (state.goal_best < cfg["esc_gate"])
                   & mv.budget_free(cfg, sc["man_ticks"], sc["man_count"],
                                    state.phase))
        k, sub = jax.random.split(state.key)
        ee = K.fk_frame(model, state.sim.q, ee_idx)[:3, 3]
        to_goal = state.sim.goal - ee
        away = -to_goal / (jnp.linalg.norm(to_goal) + 1e-9)
        v = jax.random.normal(sub, (3,))
        tang = v - jnp.dot(v, away) * away
        tang = tang / (jnp.linalg.norm(tang) + 1e-9)

        # candidate directions: +-the blocking cylinder's axis (the
        # shortest way around a cylinder) and +-a random tangent
        obs = state.sim.obstacles
        seg = obs.p1 - obs.p0                                  # (K, 3)
        seg_len2 = jnp.einsum("kc,kc->k", seg, seg)
        t_seg = jnp.clip(
            jnp.einsum("kc,kc->k", ee[None] - obs.p0, seg)
            / (seg_len2 + 1e-12), 0.0, 1.0)
        closest = obs.p0 + t_seg[:, None] * seg
        d_obs = jnp.linalg.norm(ee[None] - closest, axis=-1) - obs.radius
        dmin = jnp.min(d_obs)
        hot = d_obs <= dmin                                     # (K,)
        axis = jnp.einsum("k,kc->c", hot.astype(jnp.float32), seg)
        axis = axis / (jnp.linalg.norm(axis) + 1e-9)

        # SCORED candidate waypoints (cfg esc_cand=1) instead of guessed
        # direction: 4 candidates, each scored by clearance at the
        # waypoint minus how much farther from the goal it moves
        # (maneuver.score_candidates).
        cands = [jnp.clip(
            ee + cfg["esc_back"] * away + cfg["esc_side"] * s_dir,
            jnp.asarray(_WS_LO), jnp.asarray(_WS_HI))
            for s_dir in (axis, -axis, tang, -tang)]
        best_wp, _ = mv.score_candidates(
            cands, state.sim.goal, lambda c: mv.point_clearance(obs, c))

        # legacy guessed direction (esc_cand=0): axis slide signed toward
        # the goal on detour 1, random tangent on retries
        adot = jnp.dot(axis, to_goal)
        sign = jnp.where(jnp.abs(adot) < 0.05,
                         jnp.sign(v[0]) + (v[0] == 0), jnp.sign(adot))
        slide = sign * axis
        side = jnp.where((sc["man_count"] == 0) & (cfg["esc_axis1"] > 0.5),
                         slide, tang)
        wp_legacy = jnp.clip(
            ee + cfg["esc_back"] * away + cfg["esc_side"] * side,
            jnp.asarray(_WS_LO), jnp.asarray(_WS_HI))
        wp = jnp.where(cfg["esc_cand"] > 0.5, best_wp, wp_legacy)

        # REVERSE-OUT ring (esc_qspace=2): shift a 4-slot configuration
        # history every 8 ticks so slot -1 holds the pose from ~32 ticks
        # ago — before the wedge formed, feasible by construction
        shift = (state.steps % 8) == 0
        hist_next = jnp.where(
            shift, jnp.concatenate([state.sim.q[None], sc["q_hist"][:-1]]),
            sc["q_hist"])
        q_past = sc["q_hist"][-1]
        mode2 = cfg["esc_qspace"] > 1.5
        wp = jnp.where(mode2, K.fk_frame(model, q_past, ee_idx)[:3, 3], wp)

        ticks_next, count_next, wp_next = mv.maneuver_timers(
            cfg, sc["man_ticks"], sc["man_count"], trigger, ee, sc["wp"],
            wp, arrive_tol=0.06)
        # configuration waypoint: mode 1 = an IK re-pose consistent WITH
        # the detour waypoint (the failed esc_cspace variant pulled toward
        # q_ready, which fights it); mode 2 = the historical pose itself.
        # Computed every tick (branchless under vmap), consumed only when
        # esc_qspace binds it during a detour.
        q_cand = jnp.where(mode2, q_past, _ik_toward(state.sim.q, wp))
        q_wp = jnp.where(trigger, q_cand, sc["q_wp"])
        # push latch: engage on a near-goal stall; release on a detour
        # (the waypoint chase must run at normal gains) or after wandering
        # far from the goal (post-detour re-approach starts clean)
        engage = mv.push_engaged(cfg, state.no_progress, state.goal_best)
        push_on = jnp.where(
            cfg["push_latch"] > 0.5,
            (sc["push_on"] | engage) & ~trigger
            & (jnp.linalg.norm(to_goal) < 4.0 * cfg["push_near"]),
            engage)
        scratch = dict(sc, man_ticks=ticks_next, man_count=count_next,
                       wp=wp_next, q_wp=q_wp, q_hist=hist_next,
                       push_on=push_on)
        no_progress, goal_best = mv.freeze_progress(state, trigger,
                                                    ticks_next > 0)
        return dataclasses.replace(
            state, scratch=scratch,
            key=jnp.where(trigger, k, state.key),
            no_progress=no_progress, goal_best=goal_best)

    def bind(params, sim, pols, state):
        # state-aware goal binding: during a detour the ATTRACTOR chases
        # the waypoint while is_solved keeps reading the true sim.goal;
        # near-miss stalls engage the final-push gain boost instead
        sc = state.scratch
        cfg = sc["cfg"]
        escaping = sc["man_ticks"] > 0
        goal = jnp.where(escaping, sc["wp"], sim.goal)
        push = ~escaping & sc["push_on"]
        boost = jnp.where(push, cfg["push_boost"], 1.0)
        mscale = jnp.where(push, cfg["push_metric"], 1.0)
        relax = jnp.where(push, cfg["push_relax"], 1.0)
        # metric-only mode: the blend weight yields, the barrier force
        # stays at full strength (penetration control)
        relax_rep = jnp.where(cfg["push_relax_metric"] > 0.5, 1.0, relax)
        out = []
        for p, prm in zip(pols, params):
            if p.name == "attractor":
                prm = mv.scaled_attractor(prm, goal=goal, gain_boost=boost,
                                          metric_scale=mscale)
            elif p.name == "collision_avoidance":
                # push relax (repulsion+metric or metric-only) and the
                # detour-time metric-only relax are mutually exclusive by
                # construction (push = ~escaping & push_on)
                mrelax = relax * jnp.where(escaping, cfg["esc_relax"], 1.0)
                prm = mv.relaxed_obstacle(prm, relax_rep, mrelax)
                prm["margin"] = prm["margin"] + cfg["obs_margin"]
            elif p.name == "cspace_target":
                cspace = jnp.where(escaping, cfg["esc_cspace"], 1.0)
                qgoal = jnp.where(escaping & (cfg["esc_qspace"] > 0.5),
                                  sc["q_wp"], jnp.asarray(prm["goal"],
                                                          jnp.float32))
                prm = dict(prm, goal=qgoal,
                           metric_scalar=prm["metric_scalar"] * cspace,
                           position_gain=prm["position_gain"] * cspace)
            out.append(prm)
        return tuple(out)
    # gains retuned for the randomized workload via the one-compile grid
    # sweep (experiments/sweep_randomized.py; VERDICT r2 #3): the
    # reference-derived 06 gains (p 0.3 / d 0.6 / cap 0.5) measured 35%
    # success at 300 ticks — the 0.5 rad/s cap both strangled transit and
    # kept the tracker in the cap metric's near-singular band. p 2.5 /
    # d 1.5 / cap 0.8 measures 93% success, 2.4 goals/env
    # (reports/eval_randomized.json). 06_cluttered keeps the reference
    # gains — its golden certifies trajectory parity, not task success.
    policies = tuple(
        _v2_policy_stack(model, goal=[0.5, 0.0, 0.5], attractor_p_gain=2.5,
                         attractor_d_gain=1.5, with_cspace_bias=True,
                         max_velocity=0.8)
        + _obstacle_policies(model))

    def on_solved(state: EnvState) -> EnvState:
        # phase records the tick of the last goal event (solve OR timeout);
        # goals are rejection-sampled clear of this env's obstacles.
        # Fresh goal -> fresh escape budget and a cancelled in-flight detour.
        k, sub = jax.random.split(state.key)
        goal = rnd.randomize_goal(sub, obstacles=state.sim.obstacles)
        sim = dataclasses.replace(state.sim, goal=goal)
        zero = jnp.zeros((), jnp.int32)
        scratch = dict(state.scratch, man_ticks=zero, man_count=zero,
                       push_on=jnp.zeros((), jnp.bool_))
        return dataclasses.replace(state, sim=sim, key=k, phase=state.steps,
                                   scratch=scratch)

    # stuck detection: reactive RMPs get stuck in local minima behind
    # obstacles. Resample the goal (solved_count NOT incremented) when the
    # best EE-goal distance has not improved by > progress_eps (1 cm) for
    # 80 ticks — catches parked arms AND limit-cycle oscillation (the
    # earlier near-zero-velocity test missed oscillating envs: r2 sweeps
    # showed success ~= first-goal success, resampling never rescued
    # anyone). Progress-based windows don't steal goals from slow-but-
    # progressing envs the way a pure elapsed-time timeout measured to
    # (-9 points at 300-tick horizons).
    def stuck_fn(state: EnvState):
        return (state.no_progress
                >= mv.spent_timeout(state.scratch["cfg"],
                                    state.scratch["man_count"],
                                    state.phase))

    def reset(key):
        k_obs, k_robot, k_goal, k_carry = jax.random.split(key, 4)
        obstacles = rnd.randomize_obstacles(k_obs, n_obstacles)
        if obstacle_capacity is not None:
            from rmp_tpu.sim.collision import pad_obstacles
            obstacles = pad_obstacles(obstacles, obstacle_capacity)
        q, qd = rnd.randomize_robot_config(k_robot)
        sim = init_state(model, q=q, qd=qd, obstacles=obstacles,
                         goal=rnd.randomize_goal(k_goal,
                                                 obstacles=obstacles))
        return env_state(sim, k_carry, scratch=init_scratch(q))

    return Env(name="franka/randomized_cluttered",
               enforce_velocity_limits=True, model=model,
               policies=policies, reset=reset, ee_frame=model.frame_index(EE),
               bind_params=bind, on_solved=on_solved,
               stuck_fn=stuck_fn, pre_tick=pre_tick, max_qdd=100.0,
               # hull tier: fast randomized motion invalidates the 4-iter
               # warm carry (close-band |d| p99 27.5 mm, qdd p99 29% of
               # cold RMS); 8 iters restores 1.4 mm / 0.7%
               # (reports/gjk_warm_accuracy.json, r5 probe). The slow
               # flagship keeps the global 4-iter default.
               hull_warm_iters=8,
               resolve_method="solve")


def env_moving_goal(radius: float = 0.15, omega: float = 0.4,
                    center=(0.5, 0.0, 0.45)) -> Env:
    """MOVING-TARGET tracking: the goal orbits a circle in the y-z plane
    (conveyor/handover motif) while the v2 attractor stack tracks it — the
    signature reactive-RMP capability (no replanning, the policy IS the
    tracking law). Goal motion is a pure function of sim time via
    Env.update_scene, so batched rollouts stay one compiled program.
    Tracking quality is asserted end-to-end in tests (late-run EE error
    under 2 cm at 6 cm/s target speed; ~7 mm measured steady state)."""
    model = MODEL()
    # own stack, not _v2_policy_stack: tracking a moving target needs a
    # stiffer attractor AND a velocity cap above the demanded joint speeds
    # — the static scenes' 0.5 rad/s cap keeps the tracker permanently in
    # the cap metric's singular band (measured: NaN without the guard,
    # chatter with it)
    policies = (
        v2.target_attractor(
            goal=list(center), taskmap=_ee_pos_taskmap(model),
            accel_p_gain=1.0, accel_d_gain=1.0, accel_norm_eps=0.075,
            metric_alpha_length_scale=0.05, min_metric_alpha=0.03,
            max_metric_scalar=1, min_metric_scalar=0.5,
            proximity_metric_boost_scalar=1.0,
            proximity_metric_boost_length_scale=0.02, name="attractor"),
        v2.joint_velocity_cap(max_velocity=1.5, velocity_damping_region=0.3,
                              damping_gain=5.0, metric_weight=0.05),
        v2.joint_damping(accel_d_gain=1, metric_scalar=0.005, inertia=0.3),
        v2.cspace_biasing(
            goal=[0.0, -0.9, 0.0, -2.8, 0.0, 2.0, 0.7853981633974483, 0.02,
                  0.02],
            metric_scalar=0.005, position_gain=1, damping_gain=2,
            robust_position_term_thresh=0.5, inertia=0.0001),
    )
    c = np.asarray(center, np.float32)

    def goal_at(t):
        return jnp.asarray(c) + radius * jnp.stack(
            [jnp.zeros_like(t), jnp.cos(omega * t), jnp.sin(omega * t)])

    def update_scene(sim):
        return dataclasses.replace(sim, goal=goal_at(sim.t))

    def reset(key):
        sim = init_state(model, q=Q_READY, goal=np.asarray(
            [c[0], c[1] + radius, c[2]], np.float32))
        return env_state(sim, key)

    # solved = currently within tol of the moving target (solved_count
    # saturates at 1: 'has locked on'); tracking QUALITY is asserted by the
    # late-run EE error in tests
    return Env(name="franka/moving_goal", model=model, policies=policies,
               reset=reset, ee_frame=model.frame_index(EE),
               bind_params=_goal_bind(), update_scene=update_scene,
               solved_tol=0.04, resolve_method="solve", max_qdd=200.0)


def env_moving_obstacles(amplitude: float = 0.1,
                         omega: float = 1.0) -> Env:
    # amplitude 0.1 (was 0.15): cylinder 1's base sits 0.15 from goal 1, so
    # a 0.15 sweep parks the obstacle ON the goal and the arm (correctly)
    # never reaches it — at 0.1 the scene is hard but solvable
    """DYNAMIC obstacle avoidance: the cluttered scene's cylinders oscillate
    sinusoidally while the v2 stack pursues the goal (BASELINE.json flagship
    config: 'dynamic obstacle avoidance, cluttered env'). Obstacle motion is
    a pure function of sim time via the Env.update_scene hook, so batched/
    sharded rollouts stay one compiled program."""
    model = MODEL()
    policies = tuple(
        _v2_policy_stack(model, goal=CLUTTERED_GOALS[0], attractor_p_gain=0.3,
                         attractor_d_gain=0.6, with_cspace_bias=True)
        + _obstacle_policies(model))
    base_obstacles = cluttered_obstacles()
    K_obs = base_obstacles.count
    # per-obstacle motion directions/phases (fixed pattern)
    dirs = np.stack([np.cos(np.linspace(0, 2 * np.pi, K_obs, endpoint=False)),
                     np.sin(np.linspace(0, 2 * np.pi, K_obs, endpoint=False)),
                     np.zeros(K_obs)], axis=-1).astype(np.float32)
    phases = np.linspace(0, np.pi, K_obs).astype(np.float32)

    def update_scene(sim):
        shift = (amplitude * jnp.sin(omega * sim.t + phases)[:, None]
                 * jnp.asarray(dirs))
        obstacles = ObstacleSet(p0=base_obstacles.p0 + shift,
                                p1=base_obstacles.p1 + shift,
                                radius=base_obstacles.radius,
                                kinds=base_obstacles.kinds)
        import dataclasses as dc
        return dc.replace(sim, obstacles=obstacles)

    def on_solved(state: EnvState) -> EnvState:
        nxt = jnp.minimum(state.phase + 1, len(CLUTTERED_GOALS) - 1)
        sim = dataclasses.replace(state.sim,
                                  goal=take_row(CLUTTERED_GOALS, nxt))
        return dataclasses.replace(state, sim=sim, phase=nxt)

    def reset(key):
        sim = init_state(model, q=Q_READY, obstacles=base_obstacles,
                         goal=CLUTTERED_GOALS[0])
        return env_state(sim, key)

    return Env(name="franka/moving_obstacles", model=model,
               policies=policies, reset=reset, ee_frame=model.frame_index(EE),
               bind_params=_goal_bind(), on_solved=on_solved,
               update_scene=update_scene, max_qdd=100.0,
               resolve_method="solve")


def env_06_cluttered_environment() -> Env:
    """experiments/franka_panda/06_cluttered_environment.py — the flagship:
    full v2 stack + c-space bias + 10 collision frames x 7 cylinders, six
    sequential goals advanced in-graph when reached."""
    model = MODEL()
    policies = tuple(
        _v2_policy_stack(model, goal=CLUTTERED_GOALS[0], attractor_p_gain=0.3,
                         attractor_d_gain=0.6, with_cspace_bias=True)
        + _obstacle_policies(model))
    obstacles = cluttered_obstacles()
    goals = jnp.asarray(CLUTTERED_GOALS)

    def on_solved(state: EnvState) -> EnvState:
        nxt = jnp.minimum(state.phase + 1, len(CLUTTERED_GOALS) - 1)
        sim = dataclasses.replace(state.sim, goal=take_row(goals, nxt))
        return dataclasses.replace(state, sim=sim, phase=nxt)

    def reset(key):
        sim = init_state(model, q=Q_READY, obstacles=obstacles,
                         goal=CLUTTERED_GOALS[0])
        return env_state(sim, key)

    # max_qdd: pure divergence guard — normal commands stay well under 100
    # rad/s^2, so the clamp is identity on nominal trajectories (golden
    # parity unaffected); it bounds the large-but-finite output the clamped
    # LU resolve produces if the combined metric ever becomes singular
    return Env(name="franka/06_cluttered_environment", model=model,
               policies=policies, reset=reset, ee_frame=model.frame_index(EE),
               bind_params=_goal_bind(), on_solved=on_solved, max_qdd=1000.0)
