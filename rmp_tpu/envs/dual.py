"""Dual-arm scenarios: two Panda arms on one kinematic tree.

Capability beyond the reference (which is single-robot throughout,
SURVEY.md §2): `models/specs.make_dual_spec` composes two robot specs under
a common world root, after which FK, dynamics, collision, policies,
batching, and sharding all apply unchanged — multi-robot coordination is a
spec transform plus a policy stack, not a framework feature.

dual_panda/handover: the arms face each other (bases 0.9 m apart) and take
turns at a shared center point — every time both EEs reach their targets
the turn swaps in-graph, so the arms repeatedly trade places through the
contested center while per-link inter-arm collision policies (fed by the
analytic link-link closest-point queries,
sim/collision.robot_self_distances) keep them apart. ~5 completed
handovers per 40 s episode at the default gains.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rmp_tpu import taskmaps as tm
from rmp_tpu.envs import maneuver as mv
from rmp_tpu.envs.base import Env, EnvState, env_state
from rmp_tpu.models import kinematics as K
from rmp_tpu.models import robots
from rmp_tpu.policies import v1, v2
from rmp_tpu.sim.collision import robot_self_distances
from rmp_tpu.sim.world import init_state
from rmp_tpu.ops import geom

EE_L = "L_panda_grasptarget_hand"
EE_R = "R_panda_grasptarget_hand"
# distal links that can actually meet in the shared workspace
_DISTAL = ("panda_link4", "panda_link5", "panda_link6", "panda_link7",
           "panda_hand")

# Alternating center-handover: the arms take TURNS at a shared center
# point while the other retreats to its side station, swapping every time
# both reach their targets. Simultaneous deep-crossing goals (both EEs
# commanded into the other arm's half at once) deadlock in mutual
# repulsion — measured during design; turn-taking keeps the avoidance
# policies active (the arms meet near the center every swap) without
# head-on competition.
#   phase even: L at center, R at its side station
#   phase odd:  R at center, L at its side station
_CENTER_L = (0.30, 0.00, 0.47)
_CENTER_R = (0.30, 0.00, 0.40)
_SIDE_L = (0.35, 0.30, 0.45)
_SIDE_R = (0.35, -0.30, 0.45)
HANDOVER_PHASES = np.asarray([[_CENTER_L, _SIDE_R],
                              [_SIDE_L, _CENTER_R]], np.float32)


def _ee_taskmap(model, frame):
    return tm.chain(tm.fk_frame(model, frame), tm.to_position())


def _distal_frames(model, prefix):
    return [i for i in model.collision_frames
            if model.link_names[i].startswith(prefix)
            and model.link_names[i][2:] in _DISTAL]


def _inter_arm_policies(model):
    """(policies, left_frames, cross_pairs): one v1 collision-avoidance
    policy per distal L collision frame over its L x R closest-point rows
    (franka/03 self-avoidance pattern; repulsion fires only on genuine
    approach). ctx keys are namespaced 'inter_arm:<frame>' so they never
    collide with the obstacle distance context's per-frame entries."""
    left, right = _distal_frames(model, "L_"), _distal_frames(model, "R_")
    pairs = tuple((a, b) for a in left for b in right)
    policies = []
    for f in left:
        frame = model.frame_names[f]
        taskmap = tm.chain(tm.fk_frame(model, frame), tm.relative_points())
        pol = v1.collision_avoidance(
            taskmap=taskmap, eta_rep=0.1 * np.e, nu_rep=0.3, eta_damp=0.5,
            nu_damp=0.3, r=0.15, c=1e5, name=f"inter_arm_for_{frame}")
        pol.ctx_key = f"inter_arm:{frame}"
        policies.append(pol)
    return policies, left, pairs


def _inter_arm_ctx(model, T_all, left, pairs, hull: bool) -> dict:
    """Per-left-frame ctx dicts from the inter-arm closest-point queries."""
    if hull:
        from rmp_tpu.sim.collision import robot_self_distances_hull
        pos_a, pos_b, normal, dist = robot_self_distances_hull(
            model, T_all, pairs)
    else:
        pos_a, pos_b, normal, dist = robot_self_distances(model, T_all, pairs)
    ctx = {}
    for f in left:
        rows = [i for i, (a, _) in enumerate(pairs) if a == f]
        idx = jnp.asarray(rows)
        T = T_all[f]
        rel = geom.mv(T[:3, :3].T, pos_a[idx] - T[:3, 3])
        ctx[f"inter_arm:{model.frame_names[f]}"] = dict(
            pos_on_link=pos_a[idx], pos_on_obstacle=pos_b[idx],
            normal=normal[idx], distance=dist[idx],
            relative_position=rel, mask=jnp.ones_like(dist[idx]))
    return ctx


def env_handover() -> Env:
    model = robots.dual_panda(separation=0.9)
    q_ready = robots.dual_panda_q_ready(model)
    inter_arm, left, pairs = _inter_arm_policies(model)

    policies = [
        v2.target_attractor(
            goal=HANDOVER_PHASES[0, 0], taskmap=_ee_taskmap(model, EE_L),
            accel_p_gain=0.6, accel_d_gain=0.9, accel_norm_eps=0.075,
            metric_alpha_length_scale=0.05, min_metric_alpha=0.03,
            max_metric_scalar=1, min_metric_scalar=0.5,
            proximity_metric_boost_scalar=1.0,
            proximity_metric_boost_length_scale=0.02, name="attractor_L"),
        v2.target_attractor(
            goal=HANDOVER_PHASES[0, 1], taskmap=_ee_taskmap(model, EE_R),
            accel_p_gain=0.6, accel_d_gain=0.9, accel_norm_eps=0.075,
            metric_alpha_length_scale=0.05, min_metric_alpha=0.03,
            max_metric_scalar=1, min_metric_scalar=0.5,
            proximity_metric_boost_scalar=1.0,
            proximity_metric_boost_length_scale=0.02, name="attractor_R"),
        v2.joint_velocity_cap(max_velocity=1.0, velocity_damping_region=0.15,
                              damping_gain=5.0, metric_weight=0.05),
        v2.joint_damping(accel_d_gain=1, metric_scalar=0.005, inertia=0.3),
        v2.cspace_biasing(goal=q_ready, metric_scalar=0.005, position_gain=1,
                          damping_gain=2, robust_position_term_thresh=0.5,
                          inertia=0.0001),
    ]
    policies = tuple(policies + inter_arm)

    def context_fn(model_, sim, T_all=None):
        if T_all is None:
            T_all = K.fk_all(model_, sim.q)
        return _inter_arm_ctx(model_, T_all, left, pairs,
                              env.collision_geometry == "hull")

    iL = model.frame_index(EE_L)
    iR = model.frame_index(EE_R)

    def bind_params(params, sim, pols):
        out = []
        for p, prm in zip(pols, params):
            if p.name == "attractor_L":
                prm = dict(prm, goal=sim.goal[0])
            elif p.name == "attractor_R":
                prm = dict(prm, goal=sim.goal[1])
            out.append(prm)
        return tuple(out)

    def is_solved_fn(env_, sim):
        eL = K.fk_frame(env_.model, sim.q, iL)[:3, 3]
        eR = K.fk_frame(env_.model, sim.q, iR)[:3, 3]
        okL = jnp.linalg.norm(eL - sim.goal[0]) < env_.solved_tol
        okR = jnp.linalg.norm(eR - sim.goal[1]) < env_.solved_tol
        return okL & okR

    from rmp_tpu.envs.base import take_row

    def on_solved(state: EnvState) -> EnvState:
        # advance the turn: the center arm retreats, the other takes over
        nxt = state.phase + 1
        sim = dataclasses.replace(
            state.sim, goal=take_row(HANDOVER_PHASES, nxt % 2))
        return dataclasses.replace(state, sim=sim, phase=nxt)

    def reset(key):
        sim = init_state(model, q=q_ready,
                         goal=jnp.asarray(HANDOVER_PHASES[0]))
        return env_state(sim, key)

    # context_fn closes over the env so post-construction
    # env.collision_geometry = 'hull' switches the inter-arm queries too
    env = Env(name="dual_panda/handover", model=model, policies=policies,
              reset=reset, ee_frame=iL, solved_tol=0.03,
              bind_params=bind_params, is_solved_fn=is_solved_fn,
              context_fn=context_fn, on_solved=on_solved,
              resolve_method="solve", max_qdd=1000.0)
    return env


# --- randomized dual-arm clutter -------------------------------------------

# the shared workspace between the two bases (y = ±0.45): obstacles spawn in
# the contested middle; each arm's goals favor its own half but overlap the
# center so the arms keep crossing paths
_OBS_BOX = ((0.10, -0.28, 0.15), (0.50, 0.28, 0.85))
_GOAL_BOX_L = ((0.15, -0.05, 0.30), (0.50, 0.30, 0.65))
_GOAL_BOX_R = ((0.15, -0.30, 0.30), (0.50, 0.05, 0.65))


def env_randomized_clutter(n_obstacles: int = 5,
                           obstacle_capacity: int | None = "auto") -> Env:
    """Domain-randomized dual-arm clutter: the production-evaluation
    counterpart of dual_panda/handover — every env draws its own obstacle
    set in the shared workspace, per-arm goals rejection-sampled clear of
    them (sim/randomizer box samplers), jittered initial configs, and
    progress-based goal resampling (franka/randomized_cluttered pattern).
    Exercises the full multi-robot stack under randomization: per-arm
    attractors, grouped obstacle avoidance split PER ARM (r5: so the
    final-push relax never lowers the other arm's barrier), and inter-arm
    closest-point repulsion, in one compiled program.
    Beyond-reference capability (the reference is single-robot throughout,
    SURVEY.md §2).

    COORDINATION MACHINERY (r4; the gain surface was swept FLAT twice —
    the remaining failures are structural, ROADMAP r3): per-arm progress
    counters in EnvState.scratch drive three in-graph mechanisms that all
    act BEFORE the per-arm goal timeout, so first-goal credit is
    preserved:

      * YIELDING — when the arms contest a region (EE-EE distance <
        YIELD_RADIUS and either arm stalled YIELD_TRIGGER ticks), the arm
        FARTHER from its goal retreats to its side station while the other
        proceeds with full authority. Turn-taking is the proven dual-arm
        pattern here: head-on competition deadlocks in mutual repulsion,
        serialized passes don't (the handover scenario encodes exactly
        this, see HANDOVER_PHASES above). The near arm parks on its goal
        (an arm within hold-tolerance is never counted stalled), the
        yielder returns and finishes against a parked — not fighting —
        partner.
      * SOLO ESCAPE — an arm stalled ESC_TRIGGER ticks with no contest is
        stuck on obstacles: detour to its side station + random jitter for
        ESC_TICKS, re-approaching from a new angle each attempt
        (franka/randomized_cluttered escape pattern).
      * PER-ARM GOAL REASSIGNMENT — the stuck_fn timeout fires per arm
        (scratch counters, 80 ticks), and on_solved resamples ONLY the
        stuck arm's goal; a genuine joint solve resamples both. The old
        joint resample threw away the healthy arm's goal (and its
        progress) every time the other arm timed out."""
    from rmp_tpu.envs.franka import _obstacle_policies, bucket_capacity
    from rmp_tpu.sim import randomizer as rnd
    from rmp_tpu.sim.data import PAIRS_KEY, distance_context

    if obstacle_capacity == "auto":
        obstacle_capacity = bucket_capacity(n_obstacles)

    model = robots.dual_panda(separation=0.9)
    q_ready = robots.dual_panda_q_ready(model)
    inter_arm, left, pairs = _inter_arm_policies(model)

    # PER-ARM obstacle avoidance (r5, VERDICT r4 #6): the round-4 GLOBAL
    # grouped policy spanned both arms, so the final-push relax lowered the
    # obstacle barrier for the NON-pushing arm too — the documented source
    # of the 0.68% > 0.5% penetration. Two grouped policies (one per arm's
    # collision frames, ctx rows sliced per arm in context_fn) make the
    # relax strictly per-arm.
    arm_rows = {p: [i for i, f in enumerate(model.collision_frames)
                    if model.frame_names[f].startswith(p)]
                for p in ("L_", "R_")}
    arm_frames = {p: [model.collision_frames[i] for i in arm_rows[p]]
                  for p in ("L_", "R_")}
    PAIRS_ARM = {"L_": "__pairs_L__", "R_": "__pairs_R__"}

    # per-arm attractor gains from the franka randomized retune
    # (sweep_randomized.py: transit needs p≈2.5 / d≈1.5 and a cap above the
    # demanded joint speeds); metric shape params from the handover stack
    def attractor(goal, name):
        return v2.target_attractor(
            goal=goal, taskmap=_ee_taskmap(model, EE_L if name.endswith("L")
                                           else EE_R),
            accel_p_gain=2.5, accel_d_gain=1.5, accel_norm_eps=0.075,
            metric_alpha_length_scale=0.05, min_metric_alpha=0.03,
            max_metric_scalar=1, min_metric_scalar=0.5,
            proximity_metric_boost_scalar=1.0,
            proximity_metric_boost_length_scale=0.02, name=name)

    policies = tuple([
        attractor(list(_GOAL_BOX_L[0]), "attractor_L"),
        attractor(list(_GOAL_BOX_R[0]), "attractor_R"),
        v2.joint_velocity_cap(max_velocity=0.8, velocity_damping_region=0.15,
                              damping_gain=5.0, metric_weight=0.05),
        v2.joint_damping(accel_d_gain=1, metric_scalar=0.005, inertia=0.3),
        v2.cspace_biasing(goal=q_ready, metric_scalar=0.005, position_gain=1,
                          damping_gain=2, robust_position_term_thresh=0.5,
                          inertia=0.0001),
    ] + _obstacle_policies(model, frames=arm_frames["L_"],
                           name="collision_avoidance_L",
                           ctx_key=PAIRS_ARM["L_"])
      + _obstacle_policies(model, frames=arm_frames["R_"],
                           name="collision_avoidance_R",
                           ctx_key=PAIRS_ARM["R_"])
      + inter_arm)

    def context_fn(model_, sim, T_all=None):
        if T_all is None:
            T_all = K.fk_all(model_, sim.q)
        ctx = distance_context(model_, T_all, sim.obstacles,
                               geometry=env.collision_geometry)
        # per-arm row slices of the stacked (L, K, ...) pair context for
        # the split grouped policies (static index lists -> trace-time
        # gathers; L is small)
        for p in ("L_", "R_"):
            rows = jnp.asarray(arm_rows[p])
            ctx[PAIRS_ARM[p]] = {k: v[rows]
                                 for k, v in ctx[PAIRS_KEY].items()}
        ctx.update(_inter_arm_ctx(model_, T_all, left, pairs,
                                  env.collision_geometry == "hull"))
        return ctx

    iL = model.frame_index(EE_L)
    iR = model.frame_index(EE_R)

    # Knobs live in EnvState.scratch["cfg"] as TRACED per-env scalars so
    # sweeps override them after reset without recompiling (same
    # one-compile pattern as franka/randomized_cluttered's escape cfg).
    # Shared substrate + unified knob vocabulary: envs/maneuver.py (r5).
    CFG = dict(
        man_first_only=1.0,  # maneuvers only before the first goal event
        #                      (franka lesson: escapes on keep-busy goals
        #                      are net-negative — dual paired sweep:
        #                      ungated maneuvers cost 15 pts of overall
        #                      for +12-15 first-goal)
        man_arrive=1.0,      # end a maneuver when the arm reaches its
        #                      waypoint (8 cm) instead of parking out the
        #                      timer (franka round-5 creation lesson)
        yield_radius=0.30,  # m, EE-EE distance that counts as contested
        yield_trigger=25.0,  # stalled ticks before the far arm yields
        esc_trigger=40.0,   # stalled ticks before a solo obstacle detour
        man_ticks=30.0,     # yield/detour duration
        timeout=80.0,       # stalled ticks before the arm's goal resamples
        timeout_spent=50.0,  # faster per-arm reassignment once that arm's
        #                     maneuver budget is spent (franka pattern —
        #                     maneuvers reset the stall window, so without
        #                     this the reassignment that rescues OVERALL
        #                     success gets pushed out by hundreds of ticks)
        man_budget_late=0.0,  # maneuver budget per arm per KEEP-BUSY goal
        #                     when man_first_only=1 (0 = old hard gate;
        #                     franka round-13 split-budget pattern)
        man_budget=2.0,     # maneuvers per arm per goal; then timeout rules
        hold_tol=0.035,     # arms parked within this of goal never stall.
        #                     Must sit just ABOVE solved_tol (0.03): wider
        #                     values let an arm park at 3.5-4.5 cm where it
        #                     neither satisfies the joint solve nor ever
        #                     registers as stalled (no push, no timeout —
        #                     only the 120-tick global backstop would act)
        push_first_only=0.0,  # 1: the final-push boost also only before
        #                       the first goal event (later goals have no
        #                       detour support, and push-without-detours
        #                       measured net-negative on franka)
        push_trigger=20.0,  # final-push boost (franka pattern): stalled
        push_near=0.08,     # close to the goal -> scale the arm's
        push_boost=3.0,     # attractor gains to shift the equilibrium in
        push_relax=2.0,     # divide the pushing arm's obstacle policy's
        #                     repulsion_gain/metric_scalar by this (r5:
        #                     the policy is SPLIT per arm, so the relax
        #                     is per-arm — the round-4 global relax was
        #                     the documented penetration source)
        push_relax_global=0.0,  # 1: round-4 behavior — EITHER arm's push
        #                     relaxes BOTH arms' obstacle policies
        #                     (paired-comparison baseline)
        push_relax_metric=0.0,  # 1: relax the metric_scalar ONLY, keep
        #                     repulsion_gain full force (blend weight
        #                     yields, the barrier stays — penetration
        #                     control)
        hold_boost=1.0,     # >1: when an arm is within hold_radius of its
        #                     goal, scale its attractor gains+metric to
        #                     pin it while the other finishes. Paired-
        #                     measured CATASTROPHIC above ~3 (x6: 17%
        #                     first-goal, 8% penetration — the scaled
        #                     spring is underdamped at dt=0.01 and
        #                     explodes; x3 merely neutral at 2% pen).
        #                     Ships OFF; kept as the documented negative.
        hold_radius=0.05,   # m, engagement distance for hold-assist
        man_relax=4.0,      # divide the maneuvering arm's obstacle
        #                     metric_scalar by this DURING yields/detours
        #                     (repulsion kept). Paired round 10: flat on
        #                     success (70.2/86.6 both) and a pen freebie
        #                     (0.51 -> 0.44) — a yielding arm that can
        #                     slide along the barrier clears the contested
        #                     region cleanly instead of scraping it.
        obs_margin=0.0,     # m, ADDED to both arms' obstacle margins.
        #                     Paired round 10: POSITIVE margins hurt dual
        #                     (-3 first-goal at +5 mm, -6 at +10 mm for
        #                     ~0.05-0.17 pen) — opposite sign vs franka;
        #                     the shared workspace is too tight for extra
        #                     conservatism. Stays 0.
        man_scored=0.0,     # 1: pick the retreat waypoint by scoring 4
        #                     candidates (station, lift +30 cm, own-side
        #                     +-y) on clearance minus goal detour
        #                     (franka round-5 creation pattern). Paired-
        #                     measured NO GAIN on dual (70.1/86.9 scored
        #                     vs 70.3/87.1 fixed-station, round 5) — the
        #                     fixed stations are already in free space by
        #                     construction. Ships off.
    )
    # retreat stations: each arm's OWN side of the shared workspace, past
    # the obstacle box (|y| > 0.28) so a retreat also leaves the clutter
    _STATION = np.asarray([[0.30, 0.35, 0.55],
                           [0.30, -0.35, 0.55]], np.float32)

    def init_scratch():
        z2 = jnp.zeros(2, jnp.int32)
        return dict(man_ticks=z2, man_count=z2,
                    wp=jnp.zeros((2, 3), jnp.float32),
                    noprog=z2, best=jnp.full(2, jnp.inf, jnp.float32),
                    d=jnp.full(2, jnp.inf, jnp.float32),
                    cfg=mv.cfg_scratch(CFG))

    def bind_params(params, sim, pols, state):
        sc = state.scratch
        cfg = sc["cfg"]
        maneuvering = sc["man_ticks"] > 0                        # (2,)
        eff = jnp.where(maneuvering[:, None], sc["wp"], sim.goal)
        # per-arm final-push boost (franka/randomized_cluttered pattern:
        # near-miss stalls are force equilibria just outside tolerance)
        push = (~maneuvering & mv.push_engaged(cfg, sc["noprog"], sc["best"])
                & ((cfg["push_first_only"] < 0.5) | (state.phase == 0)))
        boost = jnp.where(push, cfg["push_boost"], 1.0)          # (2,)
        # hold-assist: pin an arm that is AT its goal while the other
        # finishes (the joint predicate needs both in tolerance at once)
        hold = sc["d"] < cfg["hold_radius"]                      # (2,)
        hboost = jnp.where(hold, cfg["hold_boost"], 1.0)
        boost = boost * hboost
        # PER-ARM relax (the policy is split per arm): only the pushing
        # arm's barrier yields; push_relax_global=1 restores the round-4
        # global behavior for paired comparison
        push_any = jnp.where(cfg["push_relax_global"] > 0.5,
                             jnp.broadcast_to(jnp.any(push), (2,)), push)
        relax = jnp.where(push_any, cfg["push_relax"], 1.0)      # (2,)
        # metric-only mode: the blend weight yields, the barrier force
        # stays at full strength (penetration control)
        relax_rep = jnp.where(cfg["push_relax_metric"] > 0.5,
                              jnp.ones_like(relax), relax)
        # maneuver-time metric-only relax (mutually exclusive with push:
        # push requires ~maneuvering)
        mrelax = relax * jnp.where(maneuvering, cfg["man_relax"], 1.0)
        out = []
        for p, prm in zip(pols, params):
            if p.name == "collision_avoidance_L":
                prm = mv.relaxed_obstacle(prm, relax_rep[0], mrelax[0])
                prm["margin"] = prm["margin"] + cfg["obs_margin"]
            elif p.name == "collision_avoidance_R":
                prm = mv.relaxed_obstacle(prm, relax_rep[1], mrelax[1])
                prm["margin"] = prm["margin"] + cfg["obs_margin"]
            elif p.name == "attractor_L":
                prm = mv.scaled_attractor(prm, goal=eff[0],
                                          gain_boost=boost[0],
                                          metric_scale=hboost[0])
            elif p.name == "attractor_R":
                prm = mv.scaled_attractor(prm, goal=eff[1],
                                          gain_boost=boost[1],
                                          metric_scale=hboost[1])
            out.append(prm)
        return tuple(out)

    def pre_tick(state: EnvState) -> EnvState:
        sc = state.scratch
        cfg = sc["cfg"]
        T_all = K.fk_all(model, state.sim.q)
        ee = jnp.stack([T_all[iL][:3, 3], T_all[iR][:3, 3]])     # (2, 3)
        d = jnp.linalg.norm(ee - state.sim.goal, axis=-1)        # (2,)

        # per-arm progress bookkeeping (same semantics as _advance's
        # global window, but an arm HOLDING its goal never stalls)
        improved = d < sc["best"] - 0.01
        best = jnp.minimum(sc["best"], d)
        noprog = jnp.where((d < cfg["hold_tol"]) | improved, 0,
                           sc["noprog"] + 1)

        free = mv.budget_free(cfg, sc["man_ticks"], sc["man_count"],
                              state.phase)
        contested = (jnp.linalg.norm(ee[0] - ee[1])
                     < cfg["yield_radius"])
        stalled_y = noprog >= cfg["yield_trigger"]
        # the FARTHER arm yields; ties (exactly equal d) break to L
        farther = jnp.where(d[0] >= d[1], jnp.asarray([True, False]),
                            jnp.asarray([False, True]))
        yield_t = contested & jnp.any(stalled_y) & farther & free
        solo_t = (~contested) & (noprog >= cfg["esc_trigger"]) & free
        trigger = yield_t | solo_t                                # (2,)

        k, sub = jax.random.split(state.key)
        jit_off = jax.random.uniform(sub, (2, 3), minval=-0.12, maxval=0.12)
        wp_station = jnp.asarray(_STATION) + jit_off

        # scored candidates per arm (franka round-5 creation pattern):
        # station, straight lift, own-side +-y slides — best clearance
        # (capped at 12 cm, vs obstacles AND the other arm's EE) minus
        # goal-detour distance (maneuver.score_candidates)
        obs = state.sim.obstacles
        side_y = (0.30, -0.30)                               # own halves
        best_per_arm = []
        for a in (0, 1):
            cands = (wp_station[a],
                     ee[a] + jnp.asarray([0.0, 0.0, 0.30], jnp.float32),
                     ee[a] + jnp.asarray([0.0, side_y[a], 0.0],
                                         jnp.float32),
                     ee[a] + jnp.asarray([-0.15, side_y[a], 0.20],
                                         jnp.float32))
            best_c, _ = mv.score_candidates(
                cands, state.sim.goal[a],
                lambda c: mv.point_clearance(
                    obs, c, seed=jnp.linalg.norm(c - ee[1 - a]) - 0.10))
            best_per_arm.append(best_c)
        wp_new = jnp.where(cfg["man_scored"] > 0.5,
                           jnp.stack(best_per_arm), wp_station)
        any_t = jnp.any(trigger)

        ticks_next, count_next, wp_next = mv.maneuver_timers(
            cfg, sc["man_ticks"], sc["man_count"], trigger, ee, sc["wp"],
            wp_new, arrive_tol=0.08)
        scratch = dict(
            sc,
            man_ticks=ticks_next,
            man_count=count_next,
            wp=wp_next,
            # freeze the stalled-arm window during its maneuver (the
            # outbound leg can't improve the true-goal distance; letting
            # it count would spend the retry budget on transit)
            noprog=jnp.where(trigger | (ticks_next > 0), 0, noprog),
            best=jnp.where(trigger, jnp.inf, best),
            d=d)
        # keep the GLOBAL window (the backstop timeout below) from firing
        # mid-maneuver
        no_progress, goal_best = mv.freeze_progress(
            state, any_t, jnp.any(ticks_next > 0))
        return dataclasses.replace(
            state, scratch=scratch,
            key=jnp.where(any_t, k, state.key),
            no_progress=no_progress, goal_best=goal_best)

    def arm_distances(sim):
        eL = K.fk_frame(model, sim.q, iL)[:3, 3]
        eR = K.fk_frame(model, sim.q, iR)[:3, 3]
        return (jnp.linalg.norm(eL - sim.goal[0]),
                jnp.linalg.norm(eR - sim.goal[1]))

    def is_solved_fn(env_, sim):
        dL, dR = arm_distances(sim)
        return (dL < env_.solved_tol) & (dR < env_.solved_tol)

    def goal_distance_fn(env_, sim):
        # progress = the WORSE arm improving (matches the joint solved
        # predicate above; summing would mask one arm regressing)
        return jnp.maximum(*arm_distances(sim))

    def _with_goal_blocked(obstacles, goal, r=0.12):
        """Obstacle set extended with a phantom sphere at `goal`: per-arm
        goals rejection-sample clear of the OTHER arm's goal — two arms
        can't occupy the same grasp region, and goals within each other's
        hold tolerance forced permanent contests before r4."""
        from rmp_tpu.sim.collision import ObstacleSet
        return ObstacleSet(
            p0=jnp.concatenate([obstacles.p0, goal[None]]),
            p1=jnp.concatenate([obstacles.p1, goal[None]]),
            radius=jnp.concatenate([obstacles.radius,
                                    jnp.full(1, r, jnp.float32)]),
            kinds=((obstacles.kinds or ("capsule",) * obstacles.count)
                   + ("capsule",)))

    def sample_goals(key, obstacles, prev=None, resample=None):
        """Fresh goals for the arms with `resample[a]` True, keeping the
        others; each new goal clears the obstacles AND the other arm's
        (kept or freshly drawn) goal."""
        kL, kR = jax.random.split(key)
        if prev is None:
            gL = rnd.randomize_goal_box(kL, *_GOAL_BOX_L,
                                        obstacles=obstacles)
            gR = rnd.randomize_goal_box(
                kR, *_GOAL_BOX_R, obstacles=_with_goal_blocked(obstacles,
                                                               gL))
            return jnp.stack([gL, gR])
        gL = jnp.where(
            resample[0],
            rnd.randomize_goal_box(kL, *_GOAL_BOX_L,
                                   obstacles=_with_goal_blocked(obstacles,
                                                                prev[1])),
            prev[0])
        gR = jnp.where(
            resample[1],
            rnd.randomize_goal_box(kR, *_GOAL_BOX_R,
                                   obstacles=_with_goal_blocked(obstacles,
                                                                gL)),
            prev[1])
        return jnp.stack([gL, gR])

    def on_solved(state: EnvState) -> EnvState:
        # fired by a joint solve OR a per-arm timeout (stuck_fn): resample
        # ONLY timed-out arms' goals; a genuine solve resamples both. The
        # pre-r4 joint resample threw away the healthy arm's goal (and all
        # its progress) whenever the OTHER arm timed out.
        sc = state.scratch
        timed_out = (sc["noprog"]
                     >= mv.spent_timeout(sc["cfg"], sc["man_count"],
                                         state.phase))       # (2,)
        both = ~jnp.any(timed_out)                   # solved / backstop
        resample = timed_out | both
        k, sub = jax.random.split(state.key)
        goals = sample_goals(sub, state.sim.obstacles,
                             prev=state.sim.goal, resample=resample)
        sim = dataclasses.replace(state.sim, goal=goals)
        scratch = dict(
            sc,
            man_ticks=jnp.where(resample, 0, sc["man_ticks"]),
            man_count=jnp.where(resample, 0, sc["man_count"]),
            noprog=jnp.where(resample, 0, sc["noprog"]),
            best=jnp.where(resample, jnp.inf, sc["best"]))
        return dataclasses.replace(state, sim=sim, key=k,
                                   phase=state.steps, scratch=scratch)

    def stuck_fn(state: EnvState):
        sc = state.scratch
        # per-arm window: the full timeout while maneuvers remain, the
        # fast one once the arm's PHASE budget is spent; plus a global
        # backstop (e.g. an arm hovering just outside hold_tol forever is
        # invisible to the per-arm windows)
        window = mv.spent_timeout(sc["cfg"], sc["man_count"], state.phase)
        return (jnp.any(sc["noprog"] >= window)
                | (state.no_progress >= 120))

    space = rnd.RobotSampleSpace(
        q_low=q_ready - 0.1, q_high=q_ready + 0.1,
        qd_low=np.full_like(q_ready, -0.005),
        qd_high=np.full_like(q_ready, 0.005))

    def reset(key):
        from rmp_tpu.sim.collision import link_world_capsules_all
        k_obs, k_robot, k_goal, k_carry = jax.random.split(key, 4)
        # sample the arms FIRST so obstacles can rejection-sample clear of
        # the posed links: the shared-workspace box overlaps the spawn
        # pose, and without the avoid pass 67% of envs started with a link
        # already inside an obstacle (the task was then impossible)
        q, qd = rnd.randomize_robot_config(k_robot, space)
        p0, p1, r, _ = link_world_capsules_all(model, K.fk_all(model, q))
        obstacles = rnd.randomize_obstacles_box(k_obs, n_obstacles,
                                                *_OBS_BOX,
                                                avoid=(p0, p1, r),
                                                avoid_clearance=0.05)
        if obstacle_capacity is not None:
            from rmp_tpu.sim.collision import pad_obstacles
            obstacles = pad_obstacles(obstacles, obstacle_capacity)
        sim = init_state(model, q=q, qd=qd, obstacles=obstacles,
                         goal=sample_goals(k_goal, obstacles))
        return env_state(sim, k_carry, scratch=init_scratch())

    env = Env(name="dual_panda/randomized_clutter", model=model,
              policies=policies, reset=reset, ee_frame=iL, solved_tol=0.03,
              bind_params=bind_params, is_solved_fn=is_solved_fn,
              goal_distance_fn=goal_distance_fn, context_fn=context_fn,
              on_solved=on_solved, stuck_fn=stuck_fn, pre_tick=pre_tick,
              enforce_velocity_limits=True, max_qdd=100.0,
              # same fast-motion warm-accuracy rationale as franka/
              # randomized_cluttered (gjk_warm_accuracy.json, r5)
              hull_warm_iters=8,
              resolve_method="solve")
    return env
