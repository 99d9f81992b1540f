"""Integration tests: the reference experiment scenarios reach their goals.

The reference has no integration tests; its experiments embed `is_solved`
distance checks (e.g. 06_cluttered_environment.py:128). Here each env rolls
out jitted and must actually solve.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rmp_tpu import envs
from rmp_tpu.envs.base import make_control_step, make_rollout


def _run(env, n_ticks, seed=0):
    state = env.reset(jax.random.PRNGKey(seed))
    rollout = jax.jit(lambda s, p: make_rollout(env, n_ticks)(s, p))
    final, aux = rollout(state, env.gather_params())
    return final, jax.tree.map(np.asarray, aux)


def test_two_joint_01_reaches_goal():
    env = envs.make("two_joint/01_target_rmp_only")
    final, aux = _run(env, 300)  # 30 s at 10 Hz control
    assert aux["solved"].any(), "target never reached"
    assert np.isfinite(aux["qdd"]).all()


@pytest.mark.slow
def test_two_joint_02_biasing_changes_elbow():
    left = envs.two_joint.env_02_jointspace_biasing(bias_left=True)
    right = envs.two_joint.env_02_jointspace_biasing(bias_left=False)
    f_left, aux_l = _run(left, 300)
    f_right, aux_r = _run(right, 300)
    assert aux_l["solved"].any() and aux_r["solved"].any()
    # redundancy resolved differently: elbow (q1) signs differ
    assert float(f_left.sim.q[0]) > 0 > float(f_right.sim.q[0])


def test_two_joint_03_jointlimit_recovers_to_midrange():
    env = envs.make("two_joint/03_jointlimit_avoiding")
    final, aux = _run(env, 300)
    # limit-avoidance alone damps the arm; it must end strictly inside limits
    q = np.asarray(final.sim.q)
    assert np.all(q > env.model.q_lower) and np.all(q < env.model.q_upper)
    assert np.isfinite(aux["qdd"]).all()


def test_two_joint_04_limits_hold():
    env = envs.make("two_joint/04_driving_into_jointlimits")
    final, aux = _run(env, 300)
    q = np.asarray(final.sim.q)
    assert np.all(q >= env.model.q_lower - 1e-4)
    assert np.all(q <= env.model.q_upper + 1e-4)


@pytest.mark.slow
def test_two_joint_05_avoids_obstacle_and_reaches_goal():
    env = envs.make("two_joint/05_obstacle_avoidance")
    state = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(make_control_step(env))
    params = env.gather_params()
    min_clearance = np.inf
    solved = False
    from rmp_tpu.models import kinematics as K
    from rmp_tpu.sim.collision import robot_obstacle_distances
    for _ in range(600):
        state, aux = step(state, params)
        T_all = K.fk_all(env.model, state.sim.q)
        _, _, _, d = robot_obstacle_distances(env.model, T_all,
                                              state.sim.obstacles)
        min_clearance = min(min_clearance, float(jnp.min(d)))
        solved = solved or bool(aux["solved"])
        if solved:
            break
    assert solved, "goal not reached around the obstacle"
    assert min_clearance > -0.01, f"robot penetrated obstacle: {min_clearance}"


def test_franka_01_reaches_goal():
    env = envs.make("franka/01_target_rmp_only")
    final, aux = _run(env, 300)
    assert aux["solved"].any()
    assert np.isfinite(aux["qdd"]).all()


@pytest.mark.slow
def test_franka_04_nullspace_biasing_moves_elbow_not_ee():
    env = envs.make("franka/04_nullspace_control")
    state = env.reset(jax.random.PRNGKey(0))
    ee0 = np.asarray(envs.base.ee_position(env, state.sim))
    q0 = np.asarray(state.sim.q)
    final, aux = _run(env, 200)
    ee1 = np.asarray(envs.base.ee_position(env, final.sim))
    # EE stays at the goal (it starts there via IK)...
    np.testing.assert_allclose(ee1, np.asarray(final.sim.goal), atol=0.05)
    # ...while the configuration drifts toward q0 in the nullspace
    assert np.linalg.norm(np.asarray(final.sim.q) - q0) > 0.05


@pytest.mark.slow
def test_franka_05_avoids_obstacle():
    env = envs.make("franka/05_obstacle_avoidance")
    state = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(make_control_step(env))
    params = env.gather_params()
    from rmp_tpu.models import kinematics as K
    from rmp_tpu.sim.collision import robot_obstacle_distances
    min_clearance = np.inf
    solved = False
    for _ in range(400):
        state, aux = step(state, params)
        T_all = K.fk_all(env.model, state.sim.q)
        _, _, _, d = robot_obstacle_distances(env.model, T_all,
                                              state.sim.obstacles)
        min_clearance = min(min_clearance, float(jnp.min(d)))
        solved = solved or bool(aux["solved"])
        if solved:
            break
    assert solved, "goal not reached"
    assert min_clearance > -0.01, f"penetration: {min_clearance}"


@pytest.mark.slow
def test_franka_06_cluttered_reaches_multiple_goals():
    env = envs.make("franka/06_cluttered_environment")
    final, aux = _run(env, 800)
    # the flagship demo: should advance through several of the 6 goals
    assert int(final.solved_count) >= 2, \
        f"only {int(final.solved_count)} goals reached"
    assert np.isfinite(aux["qdd"]).all()


@pytest.mark.slow
def test_franka_03_self_avoidance_runs():
    """Self-avoidance stack REACHES the goal (not just stays finite) while
    keeping all monitored link pairs separated."""
    from rmp_tpu.models import kinematics as K
    from rmp_tpu.sim.collision import robot_self_distances, self_collision_pairs
    from rmp_tpu.models import robots

    env = envs.make("franka/03_self_avoidance")
    pairs = self_collision_pairs(env.model, n_neighbors=3, exclude_below=0.12,
                                 q_ref=robots.PANDA_Q_READY)
    state = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(make_control_step(env))
    params = env.gather_params()
    solved, min_d = False, np.inf
    for _ in range(150):
        state, aux = step(state, params)
        assert np.isfinite(np.asarray(aux["qdd"])).all()
        _, _, _, d = robot_self_distances(
            env.model, K.fk_all(env.model, state.sim.q), pairs)
        min_d = min(min_d, float(jnp.min(d)))
        if bool(aux["solved"]):
            solved = True
            break
    assert solved, "self-avoidance stack failed to reach the goal"
    assert min_d > 0.0, f"monitored link pair contact: {min_d}"


@pytest.mark.slow
def test_batched_rollout_matches_single():
    env = envs.make("franka/01_target_rmp_only")
    params = env.gather_params()
    batched = jax.jit(lambda s, p: envs.make_batched_rollout(env, 20)(s, p))
    keys = jax.random.PRNGKey(1)
    states = envs.make_batched_reset(env, 4)(keys)
    finals, aux = batched(states, params)
    assert np.asarray(finals.sim.q).shape == (4, env.model.n_q)
    # deterministic resets -> identical rows until goal resampling kicks in
    single_final, _ = jax.jit(lambda s, p: envs.make_rollout(env, 20)(s, p))(
        jax.tree.map(lambda x: x[0], states), params)
    np.testing.assert_allclose(np.asarray(finals.sim.q)[0],
                               np.asarray(single_final.sim.q), atol=1e-5)


@pytest.mark.slow
def test_randomized_cluttered_batch():
    """Domain-randomized batched env: per-env obstacle sets/goals, one
    compiled program, no NaNs."""
    env = envs.make("franka/randomized_cluttered")
    states = envs.make_batched_reset(env, 8)(jax.random.PRNGKey(2))
    # envs drew different obstacles and goals
    p0 = np.asarray(states.sim.obstacles.p0)
    assert not np.allclose(p0[0], p0[1])
    goals = np.asarray(states.sim.goal)
    assert not np.allclose(goals[0], goals[1])
    final, aux = jax.jit(envs.make_batched_rollout(env, 20))(
        states, env.gather_params())
    assert np.isfinite(np.asarray(final.sim.q)).all()
    assert np.isfinite(np.asarray(aux["qdd"])).all()


@pytest.mark.slow
def test_torque_mode_rollout():
    """Torque-level physics path (ID -> clamp -> FD) tracks the exact path
    closely in free space (reference behavior: they cancel)."""
    env_a = envs.make("franka/01_target_rmp_only")
    env_b = envs.make("franka/01_target_rmp_only")
    env_b.torque_mode = True
    sa = env_a.reset(jax.random.PRNGKey(0))
    sb = env_b.reset(jax.random.PRNGKey(0))
    step_a = jax.jit(make_control_step(env_a))
    step_b = jax.jit(make_control_step(env_b))
    for _ in range(20):
        sa, _ = step_a(sa, env_a.gather_params())
        sb, _ = step_b(sb, env_b.gather_params())
    qa, qb = np.asarray(sa.sim.q), np.asarray(sb.sim.q)
    assert np.isfinite(qb).all()
    np.testing.assert_allclose(qa, qb, atol=5e-3)


@pytest.mark.slow
def test_pose_target_holds_orientation():
    """Position+orientation control: the 6D-rotation attractor keeps the EE
    orientation near its start while the position target is pursued; a
    position-only controller drifts far more."""
    from rmp_tpu.models import kinematics as K

    def orientation_drift(env, ticks=250):
        ee = env.ee_frame
        state = env.reset(jax.random.PRNGKey(0))
        T0 = np.asarray(K.fk_frame(env.model, state.sim.q, ee))
        final, aux = _run(env, ticks)
        T1 = np.asarray(K.fk_frame(env.model, final.sim.q, ee))
        # geodesic angle between rotations
        R_err = T0[:3, :3].T @ T1[:3, :3]
        angle = np.arccos(np.clip((np.trace(R_err) - 1) / 2, -1, 1))
        ee_err = np.linalg.norm(T1[:3, 3] - np.asarray(final.sim.goal))
        return angle, ee_err

    env = envs.make("franka/pose_target")
    angle_held, ee_err = orientation_drift(env)
    assert ee_err < 0.06, f"position not reached: {ee_err}"
    assert angle_held < 0.25, f"orientation drifted: {angle_held}"

    # ablation: position-only controller drifts much more
    import dataclasses as dc
    env_pos = envs.make("franka/pose_target")
    env_pos = dc.replace(env_pos, policies=(env_pos.policies[0],
                                            env_pos.policies[2]))
    angle_free, _ = orientation_drift(env_pos)
    assert angle_free > 2 * angle_held, (angle_free, angle_held)


@pytest.mark.slow
def test_moving_obstacles_env():
    """Dynamic obstacle avoidance: obstacles move per tick (pure function of
    sim time), the controller keeps clearance, no NaNs."""
    env = envs.make("franka/moving_obstacles")
    state = env.reset(jax.random.PRNGKey(0))
    p0_init = np.asarray(state.sim.obstacles.p0).copy()
    step = jax.jit(make_control_step(env))
    params = env.gather_params()
    from rmp_tpu.models import kinematics as K
    from rmp_tpu.sim.collision import robot_obstacle_distances
    min_clear = np.inf
    for _ in range(150):
        state, aux = step(state, params)
        T_all = K.fk_all(env.model, state.sim.q)
        _, _, _, d = robot_obstacle_distances(env.model, T_all,
                                              state.sim.obstacles)
        min_clear = min(min_clear, float(jnp.min(d)))
    assert np.isfinite(np.asarray(state.sim.q)).all()
    # obstacles actually moved
    moved = np.max(np.abs(np.asarray(state.sim.obstacles.p0) - p0_init))
    assert moved > 0.05, f"obstacles did not move: {moved}"
    # moving obstacles can sweep toward the arm; avoidance keeps worst-case
    # penetration shallow
    assert min_clear > -0.05, f"deep penetration: {min_clear}"


@pytest.mark.slow
def test_two_joint_05_variant_converges_near_goal():
    """The '05 ... copy.py' gain variant (reference diff: target beta 0.5;
    collision eta_damp 0.1 / nu_damp 0.6 / r 3). With r=3 the repulsion
    field covers the whole workspace, so the equilibrium sits slightly OFF
    the goal (the reference copy script runs fixed-duration with no solved
    check) — assert convergence near the goal, not exact reach."""
    from rmp_tpu.envs.base import ee_position

    env = envs.make("two_joint/05_obstacle_avoidance_variant")
    assert env.policies[0].params["beta"] == 0.5
    assert env.policies[1].params["r"] == 3.0
    state = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(make_control_step(env))
    params = env.gather_params()
    for _ in range(1500):
        state, aux = step(state, params)
    dist = float(jnp.linalg.norm(
        ee_position(env, state.sim)[:2] - state.sim.goal[:2]))
    assert dist < 0.25, f"variant did not converge near the goal: {dist}"
    assert float(jnp.linalg.norm(state.sim.qd)) < 0.5, "did not settle"


def test_with_aux_false_matches_final_state():
    """with_aux=False skips aux stacking + the (T,B)->(B,T) transpose (a
    measured 6% of flagship device time) but must leave the final state
    bit-identical, on both the vmapped and fused paths."""
    env = envs.make("two_joint/01_target_rmp_only")
    states = envs.make_batched_reset(env, 128)(jax.random.PRNGKey(0))
    params = env.gather_params()
    for fused in (False, True):
        fa, aux = jax.jit(
            envs.make_batched_rollout(env, 5, fused_resolve=fused))(
                states, params)
        fb, none_aux = jax.jit(
            envs.make_batched_rollout(env, 5, fused_resolve=fused,
                                      with_aux=False))(states, params)
        assert none_aux is None
        assert aux is not None
        np.testing.assert_array_equal(np.asarray(fa.sim.q),
                                      np.asarray(fb.sim.q))


def test_tick_unroll_matches_unroll1():
    """tick_unroll=k is a scan-unroll knob, not a program change: the fused
    rollout must be bit-identical to tick_unroll=1, including a tick count
    NOT divisible by k (scan's remainder handling) and the stacked aux."""
    env = envs.make("two_joint/01_target_rmp_only")
    states = envs.make_batched_reset(env, 128)(jax.random.PRNGKey(1))
    params = env.gather_params()
    f1, aux1 = jax.jit(envs.make_batched_rollout(
        env, 6, fused_resolve=True))(states, params)
    f4, aux4 = jax.jit(envs.make_batched_rollout(
        env, 6, fused_resolve=True, tick_unroll=4))(states, params)
    np.testing.assert_array_equal(np.asarray(f1.sim.q), np.asarray(f4.sim.q))
    np.testing.assert_array_equal(np.asarray(f1.sim.qd), np.asarray(f4.sim.qd))
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), aux1, aux4)


def test_invariant_carry_hoist_matches_plain_scan():
    """_scan_with_invariant_carry == a plain lax.scan, on BOTH a static
    scene (obstacles hoisted out of the carry) and a moving-obstacle scene
    (update_scene mutates them, so they must stay in the carry)."""
    from rmp_tpu.envs.base import make_batched_control_step

    for name in ("franka/06_cluttered_environment", "franka/moving_obstacles"):
        env = envs.make(name)
        env.resolve_method = "pinv"   # small batch; Pallas path needs B%128
        states = envs.make_batched_reset(env, 8)(jax.random.PRNGKey(3))
        params = env.gather_params()
        step = make_batched_control_step(env)

        def plain(states, params):
            def body(s, _):
                s, _aux = step(s, params)
                return s, None
            final, _ = jax.lax.scan(body, states, None, length=6)
            return final

        f_hoist, _ = jax.jit(envs.make_batched_rollout(
            env, 6, fused_resolve=True, with_aux=False))(states, params)
        f_plain = jax.jit(plain)(states, params)
        np.testing.assert_array_equal(np.asarray(f_hoist.sim.q),
                                      np.asarray(f_plain.sim.q))
        np.testing.assert_array_equal(
            np.asarray(f_hoist.sim.obstacles.p0),
            np.asarray(f_plain.sim.obstacles.p0))


@pytest.mark.slow
def test_dual_panda_handover():
    """Dual-arm scene (two Pandas, one kinematic tree): the arms complete
    several center handovers while the inter-arm avoidance policies keep
    every distal link pair separated."""
    from rmp_tpu.models import kinematics as K
    from rmp_tpu.sim.collision import robot_self_distances
    env = envs.make("dual_panda/handover")
    assert env.model.n_q == 18
    states = envs.make_batched_reset(env, 2)(jax.random.PRNGKey(0))
    final, aux = jax.jit(envs.make_batched_rollout(env, 250))(
        states, env.gather_params())
    q = np.asarray(final.sim.q)
    assert np.isfinite(q).all()
    # several turn swaps completed
    assert (np.asarray(final.solved_count) >= 2).all()
    # arms never collide: check the cross pairs at the final state of each
    # env (full-trajectory clearance is asserted by the env staying finite
    # under max_qdd + the repulsion policies, and visually via the GIF)
    m = env.model
    pairs = tuple((a, b) for a in m.collision_frames
                  for b in m.collision_frames
                  if m.link_names[a].startswith("L_")
                  and m.link_names[b].startswith("R_"))
    for e in range(q.shape[0]):
        T = K.fk_all(m, jnp.asarray(q[e]))
        _, _, _, d = robot_self_distances(m, T, pairs)
        assert float(jnp.min(d)) > 0.0


@pytest.mark.slow
def test_dual_handover_self_golden():
    """SELF-generated regression fixture (NOT reference parity — the
    reference has no dual-arm capability): the dual handover trajectory is
    deterministic, so any numerics change in the composed-tree FK, the
    18-DOF resolve, or the inter-arm context shows up as a diff here.
    Regenerate deliberately via the snippet in the fixture's .npz name
    sidecar (30 ticks, batch 2, PRNGKey(0))."""
    import os
    path = os.path.join(os.path.dirname(__file__), "golden",
                        "dual_handover_30t.npz")
    data = np.load(path)
    env = envs.make("dual_panda/handover")
    states = envs.make_batched_reset(env, 2)(jax.random.PRNGKey(0))
    f, _ = jax.jit(envs.make_batched_rollout(env, 30))(states,
                                                       env.gather_params())
    np.testing.assert_allclose(np.asarray(f.sim.q), data["q"], atol=1e-4)
    np.testing.assert_array_equal(np.asarray(f.solved_count),
                                  data["solved_count"])


def test_take_row_matches_gather_in_range():
    """take_row == table[idx] for in-range indices, batched and scalar."""
    from rmp_tpu.envs.base import take_row
    table = jnp.asarray(np.random.default_rng(0).normal(size=(6, 3)),
                        jnp.float32)
    for idx in range(6):
        np.testing.assert_array_equal(
            np.asarray(take_row(table, jnp.asarray(idx))),
            np.asarray(table[idx]))
    idxs = jnp.asarray([0, 5, 3, 3, 1])
    batched = jax.vmap(lambda i: take_row(table, i))(idxs)
    np.testing.assert_array_equal(np.asarray(batched),
                                  np.asarray(table[idxs]))


def test_stuck_fn_requires_on_solved():
    """stuck_fn without on_solved raises instead of being silently dead."""
    import dataclasses as dc

    import pytest as _pytest
    env = envs.make("franka/01_target_rmp_only")
    env = dc.replace(env, on_solved=None,
                     stuck_fn=lambda st: jnp.asarray(True))
    states = envs.make_batched_reset(env, 2)(jax.random.PRNGKey(0))
    with _pytest.raises(ValueError, match="stuck_fn requires on_solved"):
        jax.jit(envs.make_batched_rollout(env, 2))(states,
                                                   env.gather_params())


@pytest.mark.slow
def test_moving_goal_tracking():
    """franka/moving_goal: the reactive stack locks onto the orbiting
    target — late-run EE tracking error under 2 cm at 6 cm/s target
    speed (measured steady state ~7 mm)."""
    from rmp_tpu.models import kinematics as K
    env = envs.make("franka/moving_goal")
    states = envs.make_batched_reset(env, 2)(jax.random.PRNGKey(0))
    final, aux = jax.jit(envs.make_batched_rollout(env, 150))(
        states, env.gather_params())
    m = env.model
    g = np.asarray(final.sim.goal)
    for e in range(2):
        ee = K.fk_frame(m, jnp.asarray(np.asarray(final.sim.q)[e]),
                        m.frame_index("panda_grasptarget_hand"))[:3, 3]
        assert float(jnp.linalg.norm(ee - g[e])) < 0.02
    assert (np.asarray(final.solved_count) == 1).all()


@pytest.mark.slow
def test_progress_based_stuck_detection():
    """EnvState.no_progress counts ticks without > progress_eps EE-goal
    improvement and resets on every goal event (solve OR stuck-fire); the
    randomized env's stuck_fn resamples off it at 80 ticks, so a
    local-minimum env (parked OR oscillating) always gets a fresh goal
    (VERDICT r2 #3 / weak #4)."""
    env = envs.make("franka/randomized_cluttered")
    states = envs.make_batched_reset(env, 8)(jax.random.PRNGKey(0))
    assert float(np.asarray(states.goal_best).min()) == np.inf
    final, aux = jax.jit(envs.make_batched_rollout(env, 120))(
        states, env.gather_params())
    npg = np.asarray(final.no_progress)
    # a counter past the 80-tick threshold means a stuck env failed to
    # fire the resampling hook
    assert (npg >= 0).all() and (npg <= 80).all()
    assert int(np.asarray(aux["resample"]).sum()) > 0
    # goal_best tracks a real distance (finite once any tick ran)
    assert np.isfinite(np.asarray(final.goal_best)).all()


@pytest.mark.slow
def test_dual_randomized_clutter_behavior():
    """dual_panda/randomized_clutter: randomized obstacles/goals/configs on
    the dual-arm model. Asserts the per-arm goal boxes and obstacle-clear
    sampling hold at reset, and that a meaningful fraction of envs reach
    the JOINT success criterion (both EEs within tol simultaneously) within
    the horizon — CPU yardstick 69% at 16 envs x 300 ticks."""
    from rmp_tpu.envs.dual import _GOAL_BOX_L, _GOAL_BOX_R

    env = envs.make("dual_panda/randomized_clutter")
    B = 8
    states = envs.make_batched_reset(env, B)(jax.random.PRNGKey(3))
    g = np.asarray(states.sim.goal)                    # (B, 2, 3)
    assert g.shape == (B, 2, 3)
    for arm, (lo, hi) in enumerate((_GOAL_BOX_L, _GOAL_BOX_R)):
        assert (g[:, arm] >= np.asarray(lo) - 1e-6).all()
        assert (g[:, arm] <= np.asarray(hi) + 1e-6).all()

    final, aux = jax.jit(envs.make_batched_rollout(env, 300))(
        states, env.gather_params())
    solved = np.asarray(aux["solved"])
    assert np.isfinite(np.asarray(final.sim.q)).all()
    assert solved.any(axis=1).mean() >= 0.25
    # the progress tracker runs on the max-arm distance (goal_distance_fn);
    # goal_best is +inf by design right after a solve/stuck event resamples
    # the goal (EnvState docstring), so allow inf only where the event just
    # fired (no_progress reset to 0 on the same tick)
    gb = np.asarray(final.goal_best)
    fresh = np.asarray(final.no_progress) == 0
    assert (np.isfinite(gb) | fresh).all()


@pytest.mark.slow
def test_every_registered_scenario_rolls_finite():
    """Registry-wide wiring smoke: every registered scenario constructs,
    resets batched, and rolls 2 ticks to a finite state. Individual
    behavior tests cover each family in depth; this guards the REGISTRY
    entries themselves (a renamed builder, a missing asset, a non-finite
    first tick) so breakage surfaces here, not in a user's first run."""
    for name in envs.REGISTRY:
        env = envs.make(name)
        states = envs.make_batched_reset(env, 2)(jax.random.PRNGKey(0))
        final, _ = jax.jit(envs.make_batched_rollout(env, 2))(
            states, env.gather_params())
        q = np.asarray(final.sim.q)
        assert q.shape[0] == 2 and np.all(np.isfinite(q)), name


def test_call_bind_arity_survives_id_reuse():
    """Regression (VERDICT r4 #1): the bind-arity memo was keyed by
    id(bind) without holding the function — after GC, a NEW bind function
    reusing the id inherited a stale arity, so a 4-arg state-aware bind
    was called with 3 args (TypeError) in any process constructing
    several envs. The memo is now a WeakKeyDictionary keyed by the
    function object itself."""
    import gc

    from rmp_tpu.envs import base as B

    def mk3():
        def bind(params, sim, policies):
            return ("three", params)
        return bind

    def mk4():
        def bind(params, sim, policies, state):
            return ("four", state)
        return bind

    # Interleave construct/memoize/drop so CPython reuses freed closure
    # ids — under the old id-keyed cache this loop handed 4-arg binds a
    # stale arity of 3 within a few iterations.
    for _ in range(300):
        b3 = mk3()
        assert B._call_bind(b3, "p", "s", "pol", "st")[0] == "three"
        del b3
        b4 = mk4()
        assert B._call_bind(b4, "p", "s", "pol", "st")[0] == "four"
        del b4

    gc.collect()
    assert len(B._BIND_ARITY) == 0, "weak memo leaked dropped binds"

    # env-level: a 3-arg-bind env dropped, then a 4-arg-bind (state-aware)
    # env constructed and stepped — the round-4 suite-order failure mode.
    env3 = envs.make("franka/06_cluttered_environment")
    assert env3.bind_params is not None
    s3 = env3.reset(jax.random.PRNGKey(0))
    make_control_step(env3)(s3, env3.gather_params())
    del env3, s3
    gc.collect()
    env4 = envs.make("franka/randomized_cluttered")
    s4 = env4.reset(jax.random.PRNGKey(0))
    out4, _ = make_control_step(env4)(s4, env4.gather_params())
    assert np.isfinite(np.asarray(out4.sim.q)).all()


def test_obstacle_capacity_bucketing_no_retrace():
    """VERDICT r4 #8: scenes with different obstacle COUNTS inside one
    capacity bucket reuse the same compiled program (the reference
    Datamanager's no-retrace property, data_management.py:8-17) — and the
    inert far-away padding (sim/collision.pad_obstacles) changes nothing
    numerically: every obstacle policy's metric is exactly zero beyond
    its modulation radius."""
    from rmp_tpu.envs import franka
    from rmp_tpu.sim import collision as C
    from rmp_tpu.sim import randomizer as rnd

    env = franka.env_randomized_cluttered(5, obstacle_capacity=8)
    params = env.gather_params()
    step = jax.jit(make_control_step(env))
    s5 = env.reset(jax.random.PRNGKey(0))
    assert s5.sim.obstacles.count == 8
    out5, aux5 = step(s5, params)
    assert step._cache_size() == 1

    # a 6-obstacle scene padded into the SAME capacity: same shapes and
    # (static) kinds aux -> the jit cache entry is reused, no retrace
    obs6 = C.pad_obstacles(
        rnd.randomize_obstacles(jax.random.PRNGKey(7), 6), 8)
    s6 = dataclasses.replace(
        s5, sim=dataclasses.replace(s5.sim, obstacles=obs6))
    out6, _ = step(s6, params)
    assert step._cache_size() == 1, "padded 6-obstacle scene retraced"
    assert np.isfinite(np.asarray(out6.sim.q)).all()

    # numeric equivalence: the same 5-obstacle scene unpadded (its own
    # program) commands the same qdd as the padded one
    env_u = franka.env_randomized_cluttered(5, obstacle_capacity=None)
    s5u = env_u.reset(jax.random.PRNGKey(0))
    assert s5u.sim.obstacles.count == 5
    _, aux_u = jax.jit(make_control_step(env_u))(s5u, env_u.gather_params())
    np.testing.assert_allclose(np.asarray(aux5["qdd"]),
                               np.asarray(aux_u["qdd"]), atol=1e-6)


# --- behavioral machinery semantics (VERDICT r4 #3) -------------------------
# The escape/yield/push mechanisms are deterministic functions of EnvState:
# pin each trigger/budget/arrival/binding rule on constructed states instead
# of leaving all behavioral evidence in TPU sweep numbers quoted in comments.


def _with_cfg(state, **kv):
    """Override traced cfg knobs on a constructed EnvState."""
    cfg = dict(state.scratch["cfg"])
    for k, v in kv.items():
        cfg[k] = jnp.asarray(v, jnp.float32)
    return dataclasses.replace(state, scratch=dict(state.scratch, cfg=cfg))


def _with_scratch(state, **kv):
    return dataclasses.replace(state, scratch=dict(state.scratch, **kv))


def _franka_stalled_state(env, key=0, delta=0):
    """State stalled exactly at the env's esc_trigger (+delta ticks):
    derived from the cfg default so the tests pin trigger SEMANTICS, not
    the sweep-owned default value."""
    state = env.reset(jax.random.PRNGKey(key))
    trig = int(np.asarray(state.scratch["cfg"]["esc_trigger"]))
    return dataclasses.replace(
        state, no_progress=jnp.asarray(trig + delta, jnp.int32),
        goal_best=jnp.asarray(0.3, jnp.float32))


def test_franka_escape_trigger_budget_and_detour_binding():
    """The detour fires exactly at esc_trigger no-progress ticks (first
    goal only, budget permitting); while it runs, bind_params points the
    ATTRACTOR at the waypoint but sim.goal — what is_solved reads — is
    untouched (envs/franka.py pre_tick/bind)."""
    from rmp_tpu.envs import franka

    env = franka.env_randomized_cluttered(5)
    params = env.gather_params()

    # at the trigger: detour engages, budget ticks up, progress window
    # resets so the retry is measured from scratch
    s = _franka_stalled_state(env)
    out = env.pre_tick(s)
    assert int(out.scratch["man_ticks"]) == int(s.scratch["cfg"]["man_ticks"])
    assert int(out.scratch["man_count"]) == 1
    assert int(out.no_progress) == 0
    assert np.isinf(float(out.goal_best))
    assert not np.array_equal(np.asarray(out.key), np.asarray(s.key))
    wp = np.asarray(out.scratch["wp"])
    assert np.all(wp >= [-0.85, -0.85, 0.15]) and np.all(wp <= [0.85, 0.85,
                                                               0.95])
    # detour binding: attractor chases the waypoint, sim.goal untouched
    bound = env.bind_params(params, out.sim, env.policies, out)
    i_att = [p.name for p in env.policies].index("attractor")
    np.testing.assert_allclose(np.asarray(bound[i_att]["goal"]), wp)
    np.testing.assert_allclose(np.asarray(out.sim.goal), np.asarray(s.sim.goal))
    # no detour: attractor chases the true goal
    bound0 = env.bind_params(params, s.sim, env.policies, s)
    np.testing.assert_allclose(np.asarray(bound0[i_att]["goal"]),
                               np.asarray(s.sim.goal))

    # one tick BEFORE the trigger: nothing fires
    s_early = _franka_stalled_state(env, delta=-1)
    assert int(env.pre_tick(s_early).scratch["man_ticks"]) == 0

    # budget spent: no further detours
    s_spent = _with_scratch(_franka_stalled_state(env),
                            man_count=jnp.asarray(2, jnp.int32))
    out = env.pre_tick(s_spent)
    assert int(out.scratch["man_ticks"]) == 0
    assert int(out.scratch["man_count"]) == 2
    # budget=0 disables escapes entirely
    s_b0 = _with_cfg(_franka_stalled_state(env), man_budget=0.0)
    assert int(env.pre_tick(s_b0).scratch["man_ticks"]) == 0

    # keep-busy goals (phase != 0, i.e. after a goal event) never detour
    # at the default man_budget_late=0...
    s_late = dataclasses.replace(_franka_stalled_state(env),
                                 phase=jnp.asarray(7, jnp.int32))
    assert int(env.pre_tick(s_late).scratch["man_ticks"]) == 0
    # ...but the split budget (r5 round 13/14) gives them their own
    # allowance without touching the first goal's
    s_late1 = _with_cfg(s_late, man_budget_late=1.0)
    assert int(env.pre_tick(s_late1).scratch["man_ticks"]) > 0
    s_late_spent = _with_scratch(s_late1,
                                 man_count=jnp.asarray(1, jnp.int32))
    assert int(env.pre_tick(s_late_spent).scratch["man_ticks"]) == 0


def test_franka_escape_ends_on_arrival():
    """man_arrive=1: a detour that reached its waypoint (within 6 cm) ends
    immediately instead of parking out the timer; man_arrive=0 parks."""
    from rmp_tpu.envs import franka
    from rmp_tpu.envs.base import ee_position

    env = franka.env_randomized_cluttered(5)
    state = env.reset(jax.random.PRNGKey(0))
    ee = ee_position(env, state.sim)
    mid = _with_scratch(state, man_ticks=jnp.asarray(10, jnp.int32),
                        wp=ee + 0.01)             # arrived (1.7 cm off)
    assert int(env.pre_tick(mid).scratch["man_ticks"]) == 0
    parked = _with_cfg(mid, man_arrive=0.0)
    assert int(env.pre_tick(parked).scratch["man_ticks"]) == 9
    far = _with_scratch(mid, wp=ee + jnp.asarray([0.0, 0.3, 0.0]))
    assert int(env.pre_tick(far).scratch["man_ticks"]) == 9


def test_franka_push_engages_at_near_stall_and_relaxes_obstacles():
    """The final-push boost engages at push_trigger stalled ticks IF the
    env has been within push_near of the goal: attractor gains scale by
    push_boost (d by sqrt) and the obstacle policies relax by push_relax."""
    from rmp_tpu.envs import franka

    env = franka.env_randomized_cluttered(5)
    params = env.gather_params()
    names = [p.name for p in env.policies]
    i_att, i_obs = names.index("attractor"), names.index("collision_avoidance")

    near = dataclasses.replace(
        env.reset(jax.random.PRNGKey(0)),
        no_progress=jnp.asarray(20, jnp.int32),
        goal_best=jnp.asarray(0.05, jnp.float32))
    out = env.pre_tick(near)
    assert bool(out.scratch["push_on"])
    bound = env.bind_params(params, out.sim, env.policies, out)
    cfg = out.scratch["cfg"]
    np.testing.assert_allclose(
        float(bound[i_att]["accel_p_gain"]),
        float(params[i_att]["accel_p_gain"]) * float(cfg["push_boost"]))
    np.testing.assert_allclose(
        float(bound[i_att]["accel_d_gain"]),
        float(params[i_att]["accel_d_gain"])
        * np.sqrt(float(cfg["push_boost"])), rtol=1e-6)
    np.testing.assert_allclose(
        float(bound[i_obs]["repulsion_gain"]),
        float(params[i_obs]["repulsion_gain"]) / float(cfg["push_relax"]))
    np.testing.assert_allclose(
        float(bound[i_obs]["metric_scalar"]),
        float(params[i_obs]["metric_scalar"]) / float(cfg["push_relax"]))

    # a stall that never got near the goal does NOT push (that's the
    # detour's job), and an un-stalled env doesn't either
    far = dataclasses.replace(near, goal_best=jnp.asarray(0.5, jnp.float32))
    assert not bool(env.pre_tick(far).scratch["push_on"])
    fresh = dataclasses.replace(near, no_progress=jnp.asarray(3, jnp.int32))
    assert not bool(env.pre_tick(fresh).scratch["push_on"])
    # and the un-pushed binding leaves every gain at its shipped value
    bound0 = env.bind_params(params, near.sim, env.policies,
                             env.pre_tick(far))
    np.testing.assert_allclose(float(bound0[i_obs]["repulsion_gain"]),
                               float(params[i_obs]["repulsion_gain"]))


def test_franka_obs_margin_and_detour_metric_relax_binding():
    """r5 knobs: obs_margin is ADDED to the obstacle policy's margin in
    every binding, and esc_relax divides its metric_scalar (repulsion
    kept) only WHILE a detour runs."""
    from rmp_tpu.envs import franka

    env = franka.env_randomized_cluttered(5)
    params = env.gather_params()
    names = [p.name for p in env.policies]
    i_obs = names.index("collision_avoidance")

    s = env.reset(jax.random.PRNGKey(0))
    cfg = s.scratch["cfg"]
    np.testing.assert_allclose(float(cfg["obs_margin"]), 0.005,
                               rtol=1e-6)             # shipped default
    bound = env.bind_params(params, s.sim, env.policies, s)
    np.testing.assert_allclose(
        float(bound[i_obs]["margin"]),
        float(params[i_obs]["margin"]) + float(cfg["obs_margin"]))
    # no detour in flight: metric at full strength
    np.testing.assert_allclose(float(bound[i_obs]["metric_scalar"]),
                               float(params[i_obs]["metric_scalar"]))
    # mid-detour: metric_scalar / esc_relax, repulsion untouched
    mid = _with_scratch(s, man_ticks=jnp.asarray(10, jnp.int32))
    bound_mid = env.bind_params(params, mid.sim, env.policies, mid)
    np.testing.assert_allclose(
        float(bound_mid[i_obs]["metric_scalar"]),
        float(params[i_obs]["metric_scalar"]) / float(cfg["esc_relax"]))
    np.testing.assert_allclose(float(bound_mid[i_obs]["repulsion_gain"]),
                               float(params[i_obs]["repulsion_gain"]))


def test_dual_man_relax_applies_to_maneuvering_arm_only():
    """r5 knob: man_relax divides ONLY the maneuvering arm's obstacle
    metric_scalar (per-arm split policies); obs_margin (default 0 on
    dual) broadcasts to both arms' margins."""
    from rmp_tpu.envs import dual

    env = dual.env_randomized_clutter(3)
    params = env.gather_params()
    names = [p.name for p in env.policies]
    iL = names.index("collision_avoidance_L")
    iR = names.index("collision_avoidance_R")

    s = env.reset(jax.random.PRNGKey(0))
    cfg = s.scratch["cfg"]
    assert float(cfg["man_relax"]) == 4.0             # shipped default
    assert float(cfg["obs_margin"]) == 0.0
    # left arm mid-maneuver, right arm free
    sc = dict(s.scratch, man_ticks=jnp.asarray([10, 0], jnp.int32))
    mid = dataclasses.replace(s, scratch=sc)
    bound = env.bind_params(params, mid.sim, env.policies, mid)
    np.testing.assert_allclose(
        float(bound[iL]["metric_scalar"]),
        float(params[iL]["metric_scalar"]) / float(cfg["man_relax"]))
    np.testing.assert_allclose(float(bound[iR]["metric_scalar"]),
                               float(params[iR]["metric_scalar"]))
    np.testing.assert_allclose(float(bound[iL]["repulsion_gain"]),
                               float(params[iL]["repulsion_gain"]))


def test_randomized_envs_pin_hull_warm_iters():
    """The fast-motion randomized envs pin 8 warm GJK iterations (the
    4-iter default leaves 27.5 mm close-band p99 there —
    reports/gjk_warm_accuracy.json); the slow flagship keeps the global
    default (None -> RMP_GJK_ITERS)."""
    from rmp_tpu.envs import dual, franka

    assert franka.env_randomized_cluttered(3).hull_warm_iters == 8
    assert dual.env_randomized_clutter(3).hull_warm_iters == 8
    assert franka.env_06_cluttered_environment().hull_warm_iters is None


def test_franka_goal_event_resets_escape_budget():
    """on_solved (solve or timeout resample): fresh goal, fresh escape
    budget, any in-flight detour cancelled."""
    from rmp_tpu.envs import franka

    env = franka.env_randomized_cluttered(5)
    state = _with_scratch(env.reset(jax.random.PRNGKey(0)),
                          man_ticks=jnp.asarray(7, jnp.int32),
                          man_count=jnp.asarray(2, jnp.int32),
                          push_on=jnp.asarray(True))
    out = env.on_solved(state)
    assert int(out.scratch["man_ticks"]) == 0
    assert int(out.scratch["man_count"]) == 0
    assert not bool(out.scratch["push_on"])
    assert not np.allclose(np.asarray(out.sim.goal), np.asarray(state.sim.goal))


def test_bucketing_default_shares_cache_across_counts():
    """VERDICT r4 #8: bucketing is the DEFAULT — envs constructed through
    the registry path with different obstacle counts inside one 8-bucket
    produce identically-shaped states, so one compiled step serves all of
    them (the reference Datamanager's no-retrace property end-to-end)."""
    from rmp_tpu.envs import franka

    env8 = envs.make("franka/randomized_cluttered")     # n=7 -> bucket 8
    step = jax.jit(make_control_step(env8))
    params = env8.gather_params()
    s7 = env8.reset(jax.random.PRNGKey(0))
    assert s7.sim.obstacles.count == 8
    step(s7, params)
    assert step._cache_size() == 1
    for n in (3, 5, 8):
        env_n = franka.env_randomized_cluttered(n)
        sn = env_n.reset(jax.random.PRNGKey(n))
        assert sn.sim.obstacles.count == 8, f"n={n} not bucketed"
        out, _ = step(sn, params)
        assert np.isfinite(np.asarray(out.sim.q)).all()
    assert step._cache_size() == 1, "bucketed scenes retraced"
    # dual buckets too
    from rmp_tpu.envs import dual
    assert dual.env_randomized_clutter(3).reset(
        jax.random.PRNGKey(0)).sim.obstacles.count == 8


def test_franka_escape_rescues_walled_scene():
    """End-to-end: a deterministic 3-cylinder wall between EE and goal
    traps the reactive RMP in a local minimum forever — the escape detour
    (and nothing else: goal timeouts disabled) gets the arm around it.
    Identical scene/params, only the traced man_budget knob differs."""
    from rmp_tpu.envs import franka
    from rmp_tpu.sim.collision import ObstacleSet, cylinder_obstacle

    env = franka.env_randomized_cluttered(3)
    wall = ObstacleSet.of(*[
        cylinder_obstacle([x, 0.20, 0.5], [0, 0, 0], 0.03, 0.7)
        for x in (0.42, 0.48, 0.54)])

    def wall_state(budget):
        s = env.reset(jax.random.PRNGKey(0))
        sim = dataclasses.replace(
            s.sim, q=jnp.asarray(franka.Q_READY),
            qd=jnp.zeros_like(s.sim.qd), obstacles=wall,
            goal=jnp.asarray([0.48, 0.40, 0.41]))
        # timeouts off: the ONLY rescue mechanism in play is the detour.
        # esc_trigger pinned at 35: this scene's reactive limit cycle
        # yields occasional >1 cm improvements with period ~35-40 ticks,
        # so the (sweep-owned) default trigger of 40 keeps resetting the
        # stall counter here — the test pins the detour MECHANISM on a
        # deterministic scene, not the default trigger timing.
        s = _with_cfg(dataclasses.replace(s, sim=sim),
                      timeout=1e6, timeout_spent=1e6, man_budget=budget,
                      esc_trigger=35.0)
        return s

    states = jax.tree.map(lambda *x: jnp.stack(x),
                          wall_state(0.0), wall_state(3.0))
    roll = jax.jit(jax.vmap(make_rollout(env, 400), in_axes=(0, None)))
    final, aux = roll(states, env.gather_params())
    solved = np.asarray(aux["solved"]).any(axis=1)
    best = np.asarray(final.goal_best)
    assert not solved[0] and best[0] > 0.15, (
        f"budget=0 should stay walled off (best {best[0]:.3f})")
    assert solved[1], f"escape budget should rescue (best {best[1]:.3f})"


def _dual_state(env, key=0):
    return env.reset(jax.random.PRNGKey(key))


def test_dual_contest_farther_arm_yields():
    """When the arms contest a region and one is stalled, the arm FARTHER
    from its goal retreats toward its side station while the near arm keeps
    its true goal (envs/dual.py pre_tick/bind_params)."""
    from rmp_tpu.envs import dual
    from rmp_tpu.models import kinematics as K

    env = dual.env_randomized_clutter(3)
    params = env.gather_params()
    state = _dual_state(env)
    iL = env.model.frame_index(dual.EE_L)
    eL = K.fk_frame(env.model, state.sim.q, iL)[:3, 3]

    # L parked AT its goal (never counts as stalled), R far from its goal
    # and stalled; force 'contested' via the traced yield_radius knob
    goals = jnp.stack([eL, jnp.asarray([0.45, -0.25, 0.35])])
    state = dataclasses.replace(
        state, sim=dataclasses.replace(state.sim, goal=goals))
    state = _with_scratch(state,
                          noprog=jnp.asarray([30, 30], jnp.int32),
                          best=jnp.asarray([0.0, 0.4], jnp.float32))
    state = _with_cfg(state, yield_radius=5.0)
    out = env.pre_tick(state)
    man = np.asarray(out.scratch["man_ticks"])
    assert man[1] > 0 and man[0] == 0, "the FARTHER arm (R) must yield"
    assert int(np.asarray(out.scratch["man_count"])[1]) == 1
    # R's waypoint is its side station (+ up-to-12cm jitter), on R's side
    wp = np.asarray(out.scratch["wp"])[1]
    assert np.linalg.norm(wp - [0.30, -0.35, 0.55]) < 0.25
    assert wp[1] < 0
    # binding: R chases the waypoint, L keeps its true goal
    bound = env.bind_params(params, out.sim, env.policies, out)
    names = [p.name for p in env.policies]
    np.testing.assert_allclose(
        np.asarray(bound[names.index("attractor_R")]["goal"]), wp)
    np.testing.assert_allclose(
        np.asarray(bound[names.index("attractor_L")]["goal"]),
        np.asarray(goals[0]), atol=1e-6)

    # not contested (radius 0): the same stall pattern yields nobody
    # before esc_trigger (40)
    solo = _with_cfg(state, yield_radius=0.0)
    assert np.all(np.asarray(env.pre_tick(solo).scratch["man_ticks"]) == 0)
    # ... but a 40-tick uncontested stall fires the SOLO escape per arm
    # (goals far from BOTH arms — a parked arm never counts as stalled)
    far_goals = jnp.asarray([[0.45, 0.25, 0.35], [0.45, -0.25, 0.35]])
    solo40 = dataclasses.replace(
        solo, sim=dataclasses.replace(solo.sim, goal=far_goals))
    solo40 = _with_scratch(solo40,
                           noprog=jnp.asarray([40, 40], jnp.int32),
                           best=jnp.asarray([0.0, 0.0], jnp.float32))
    man_solo = np.asarray(env.pre_tick(solo40).scratch["man_ticks"])
    assert man_solo[0] > 0 and man_solo[1] > 0


def test_dual_push_relax_modes_and_budget():
    """The dual push relaxes ONLY the pushing arm's (split) obstacle
    policy; push_relax_global=1 restores the round-4 global behavior, and
    with push_relax_metric=1 only the metric yields (the repulsion barrier
    stays). Maneuver budget gates both yield and solo escapes."""
    from rmp_tpu.envs import dual

    env = dual.env_randomized_clutter(3)
    params = env.gather_params()
    names = [p.name for p in env.policies]
    i_oL = names.index("collision_avoidance_L")
    i_oR = names.index("collision_avoidance_R")
    i_L = names.index("attractor_L")

    # only arm L stalls near its goal -> only L's barrier relaxes
    state = _with_scratch(_dual_state(env),
                          noprog=jnp.asarray([25, 0], jnp.int32),
                          best=jnp.asarray([0.05, jnp.inf], jnp.float32))
    bound = env.bind_params(params, state.sim, env.policies, state)
    cfg = state.scratch["cfg"]
    np.testing.assert_allclose(
        float(bound[i_L]["accel_p_gain"]),
        float(params[i_L]["accel_p_gain"]) * float(cfg["push_boost"]))
    np.testing.assert_allclose(
        float(bound[i_oL]["repulsion_gain"]),
        float(params[i_oL]["repulsion_gain"]) / float(cfg["push_relax"]))
    np.testing.assert_allclose(
        float(bound[i_oR]["repulsion_gain"]),
        float(params[i_oR]["repulsion_gain"]),
        err_msg="non-pushing arm's barrier must NOT relax")
    # round-4 global mode: either arm's push relaxes both barriers
    state_g = _with_cfg(state, push_relax_global=1.0)
    bound_g = env.bind_params(params, state_g.sim, env.policies, state_g)
    np.testing.assert_allclose(
        float(bound_g[i_oR]["repulsion_gain"]),
        float(params[i_oR]["repulsion_gain"]) / float(cfg["push_relax"]))
    # metric-only mode: barrier force kept, blend weight yields
    state_m = _with_cfg(state, push_relax_metric=1.0)
    bound_m = env.bind_params(params, state_m.sim, env.policies, state_m)
    np.testing.assert_allclose(float(bound_m[i_oL]["repulsion_gain"]),
                               float(params[i_oL]["repulsion_gain"]))
    np.testing.assert_allclose(
        float(bound_m[i_oL]["metric_scalar"]),
        float(params[i_oL]["metric_scalar"]) / float(cfg["push_relax"]))

    # budget: an arm with its maneuvers spent cannot yield or escape
    spent = _with_scratch(state,
                          noprog=jnp.asarray([50, 50], jnp.int32),
                          best=jnp.asarray([0.3, 0.4], jnp.float32),
                          man_count=jnp.asarray([2, 2], jnp.int32))
    spent = _with_cfg(spent, yield_radius=5.0)
    assert np.all(np.asarray(env.pre_tick(spent).scratch["man_ticks"]) == 0)


def test_dual_per_arm_goal_reassignment():
    """on_solved fired by a per-arm timeout resamples ONLY the stuck arm's
    goal; a genuine joint solve resamples both (envs/dual.py on_solved)."""
    from rmp_tpu.envs import dual

    env = dual.env_randomized_clutter(3)
    state = _dual_state(env)
    prev = np.asarray(state.sim.goal)

    # L timed out (noprog >= 80), R healthy
    stuck = _with_scratch(state, noprog=jnp.asarray([90, 10], jnp.int32),
                          man_count=jnp.asarray([2, 1], jnp.int32))
    out = env.on_solved(stuck)
    new = np.asarray(out.sim.goal)
    assert not np.allclose(new[0], prev[0]), "stuck arm's goal must resample"
    np.testing.assert_allclose(new[1], prev[1])
    # the stuck arm's maneuver budget resets, the healthy arm's doesn't
    assert int(np.asarray(out.scratch["man_count"])[0]) == 0
    assert int(np.asarray(out.scratch["man_count"])[1]) == 1

    # joint solve (nobody timed out): both goals resample
    solved = _with_scratch(state, noprog=jnp.asarray([0, 0], jnp.int32))
    both = np.asarray(env.on_solved(solved).sim.goal)
    assert not np.allclose(both[0], prev[0])
    assert not np.allclose(both[1], prev[1])
