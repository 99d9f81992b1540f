"""Unit tests for the policy libraries and the combination core.

The reference shipped no policy/core unit tests (SURVEY.md §4); these cover
the math invariants, plus exactness cases where pinv-resolve has a closed
form.
"""
import jax
import jax.numpy as jnp
import numpy as np

from rmp_tpu import core as rmp_core
from rmp_tpu import taskmaps as tm
from rmp_tpu.models import robots
from rmp_tpu.policies import v1, v2
import pytest

rng = np.random.default_rng(3)


def _ee_pos_taskmap(model, frame):
    return tm.chain(tm.fk_frame(model, frame), tm.to_position())


def test_single_identity_policy_resolves_to_its_accel():
    """One policy on the identity map with nonsingular metric: q̈ = a."""
    q0 = jnp.asarray([0.5, -0.2], jnp.float32)
    pol = v1.configuration_space_biasing(q0=q0, gamma_p=0.3, gamma_d=0.1,
                                         name="bias")
    core = rmp_core.RmpCore()
    core.add_rmp(pol)
    q = jnp.asarray([0.1, 0.4], jnp.float32)
    qd = jnp.asarray([0.0, -0.3], jnp.float32)
    qdd = np.asarray(core.evaluate(q, qd))
    want = 0.3 * (np.asarray(q0) - np.asarray(q)) - 0.1 * np.asarray(qd)
    np.testing.assert_allclose(qdd, want, atol=1e-5)


def test_metric_weighted_average_of_two_identity_policies():
    """Two identity-space policies with scalar metrics w1, w2:
    q̈ = (w1 a1 + w2 a2) / (w1 + w2)."""
    g1 = jnp.asarray([1.0, 0.0], jnp.float32)
    g2 = jnp.asarray([0.0, 1.0], jnp.float32)
    p1 = v1.configuration_space_biasing(g1, 1.0, 0.0, name="p1", w=0.3)
    p2 = v1.configuration_space_biasing(g2, 1.0, 0.0, name="p2", w=0.7)
    core = rmp_core.RmpCore(dict(p1=p1, p2=p2))
    q = jnp.zeros(2)
    qd = jnp.zeros(2)
    qdd = np.asarray(core.evaluate(q, qd))
    a1, a2 = np.asarray(g1), np.asarray(g2)
    want = (0.3 * a1 + 0.7 * a2) / (0.3 + 0.7)
    np.testing.assert_allclose(qdd, want, atol=1e-5)


def test_target_policy_accelerates_toward_goal():
    model = robots.two_joint_robot()
    pol = v1.target_policy(goal=jnp.asarray([1.4, -1.4, 0.125]),
                           taskmap=_ee_pos_taskmap(model, "link_23"),
                           alpha=0.1, beta=0.5, c=0.1, name="target")
    core = rmp_core.RmpCore()
    core.add_rmp(pol)
    q = jnp.zeros(2)
    qd = jnp.zeros(2)
    qdd = np.asarray(core.evaluate(q, qd))
    assert np.all(np.isfinite(qdd))
    # moving along qdd should reduce EE distance to goal
    from rmp_tpu.models import kinematics as K
    ee = model.frame_index("link_23")
    x0 = np.asarray(K.fk_frame(model, q, ee))[:3, 3]
    eps = 1e-2
    x1 = np.asarray(K.fk_frame(model, q + eps * qdd, ee))[:3, 3]
    goal = np.array([1.4, -1.4, 0.125])
    assert np.linalg.norm(x1 - goal) < np.linalg.norm(x0 - goal)


def test_target_attractor_v2_shapes_and_direction():
    x = jnp.asarray([[0.2, 0.0, 0.3]], jnp.float32)
    xd = jnp.zeros((1, 3), jnp.float32)
    pol = v2.target_attractor(
        goal=[0.6, 0.0, 0.4], taskmap=None, accel_p_gain=0.3, accel_d_gain=0.6,
        accel_norm_eps=0.075, metric_alpha_length_scale=0.05,
        min_metric_alpha=0.03, max_metric_scalar=1, min_metric_scalar=0.5,
        proximity_metric_boost_scalar=1.0,
        proximity_metric_boost_length_scale=0.02)
    a, M = pol.evaluate(x, xd)
    assert a.shape == (1, 3) and M.shape == (1, 3, 3)
    delta = np.array([0.4, 0.0, 0.1])
    cos = np.dot(np.asarray(a)[0], delta) / (
        np.linalg.norm(a) * np.linalg.norm(delta))
    assert cos > 0.99
    # metric is symmetric PSD
    Mn = np.asarray(M)[0]
    np.testing.assert_allclose(Mn, Mn.T, atol=1e-6)
    assert np.all(np.linalg.eigvalsh(Mn) > 0)


def test_joint_velocity_cap_inactive_below_cutoff():
    pol = v2.joint_velocity_cap(max_velocity=0.5, velocity_damping_region=0.15,
                                damping_gain=5.0, metric_weight=0.05)
    x = jnp.zeros((1, 4))
    xd = jnp.asarray([[0.1, -0.2, 0.0, 0.3]], jnp.float32)  # all below 0.35
    a, M = pol.evaluate(x, xd)
    np.testing.assert_allclose(np.asarray(a), np.zeros((1, 4)), atol=0)
    # active above cutoff: decelerates the offending joint
    xd = jnp.asarray([[0.45, 0.0, 0.0, -0.45]], jnp.float32)
    a, M = pol.evaluate(x, xd)
    assert np.asarray(a)[0, 0] < 0 and np.asarray(a)[0, 3] > 0


def test_joint_damping_opposes_velocity():
    pol = v2.joint_damping(accel_d_gain=1.0, metric_scalar=0.005, inertia=0.3)
    xd = jnp.asarray([[0.2, -0.4, 0.1]], jnp.float32)
    a, M = pol.evaluate(jnp.zeros((1, 3)), xd)
    assert np.dot(np.asarray(a)[0], np.asarray(xd)[0]) < 0
    Mn = np.asarray(M)[0]
    np.testing.assert_allclose(Mn, np.eye(3) * Mn[0, 0], atol=1e-7)
    assert Mn[0, 0] >= 0.3  # inertia floor


def test_obstacle_avoidance_metric_gates():
    pol = v2.obstacle_avoidance(
        taskmap=None, margin=0.0, damping_gain=50, damping_std_dev=0.04,
        damping_robustness_eps=0.01, damping_velocity_gate_length_scale=0.01,
        repulsion_gain=800, repulsion_std_dev=0.01,
        metric_modulation_radius=0.5, metric_scalar=1,
        metric_exploder_std_dev=0.02, metric_exploder_eps=0.001, name="obs")
    # far away (beyond modulation radius): zero metric
    x = jnp.asarray([[0.8]], jnp.float32)
    a, M = pol.evaluate(x, jnp.zeros((1, 1)))
    np.testing.assert_allclose(np.asarray(M), np.zeros((1, 1, 1)), atol=0)
    # close: large positive metric, repulsive (positive = increasing distance)
    x = jnp.asarray([[0.01]], jnp.float32)
    a, M = pol.evaluate(x, jnp.asarray([[-0.1]], jnp.float32))
    assert np.asarray(M)[0, 0, 0] > 1.0
    assert np.asarray(a)[0, 0] > 0


def test_collision_avoidance_v1_repels_along_normal():
    pol = v1.collision_avoidance(taskmap=None, eta_rep=0.1 * np.e, nu_rep=0.3,
                                 eta_damp=1, nu_damp=0.3, r=1.1, c=1e5)
    ctx = {"distance": jnp.asarray([0.2], jnp.float32),
           "normal": jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)}
    x = jnp.zeros((1, 3))
    xd = jnp.asarray([[0.0, 0.0, -0.5]], jnp.float32)  # moving into obstacle
    a, M = pol.evaluate(x, xd, ctx=ctx)
    assert np.asarray(a)[0, 2] > 0  # pushes away along the normal
    assert np.asarray(M)[0, 2, 2] > 0
    # beyond radius r: weight -> 0
    ctx_far = {"distance": jnp.asarray([2.0], jnp.float32),
               "normal": ctx["normal"]}
    _, M_far = pol.evaluate(x, xd, ctx=ctx_far)
    np.testing.assert_allclose(np.asarray(M_far), np.zeros((1, 3, 3)), atol=0)


def test_joint_limit_avoidance_weights_activate_near_limits():
    low = jnp.asarray([-np.pi, -np.pi], jnp.float32)
    high = jnp.asarray([np.pi, np.pi], jnp.float32)
    pol = v1.joint_limit_avoidance(low, high, gamma_p=0.3, gamma_d=1.0)
    # center: normalized distance 0.5 >> 0.15 -> zero metric
    a, M = pol.evaluate(jnp.zeros((1, 2)), jnp.zeros((1, 2)))
    np.testing.assert_allclose(np.asarray(M), np.zeros((1, 2, 2)), atol=0)
    # near upper limit of joint 0: nonzero metric column for joint 0
    q = jnp.asarray([[np.pi - 0.05, 0.0]], jnp.float32)
    a, M = pol.evaluate(q, jnp.zeros((1, 2)))
    assert np.asarray(M)[0, 0, 0] > 0
    # command pushes joint 0 negative (away from upper limit)
    assert np.asarray(a)[0, 0] < 0


@pytest.mark.slow
def test_core_jits_and_vmaps():
    model = robots.two_joint_robot()
    target = v1.target_policy(goal=jnp.asarray([1.4, -1.4, 0.125]),
                              taskmap=_ee_pos_taskmap(model, "link_23"),
                              alpha=0.1, beta=0.5, c=0.1, name="target")
    bias = v1.configuration_space_biasing(jnp.zeros(2), 0.01, 0.1, name="bias")
    core = rmp_core.RmpCore(dict(target=target, bias=bias))
    fn = core.make_evaluate()
    params = core.gather_params()
    ctxs = (None, None)
    batched = jax.jit(jax.vmap(lambda q, qd: fn(q, qd, params, ctxs)))
    qs = jnp.asarray(rng.uniform(-1, 1, (16, 2)), jnp.float32)
    qds = jnp.asarray(rng.uniform(-1, 1, (16, 2)), jnp.float32)
    out = np.asarray(batched(qs, qds))
    assert out.shape == (16, 2)
    assert np.all(np.isfinite(out))
    # batch row matches single evaluation
    single = np.asarray(fn(qs[5], qds[5], params, ctxs))
    np.testing.assert_allclose(out[5], single, atol=1e-5)


def test_resolve_methods_agree_on_psd():
    A = np.array([[2.0, 0.3], [0.3, 1.0]], dtype=np.float32)
    f = np.array([0.5, -1.0], dtype=np.float32)
    qdd_p = np.asarray(rmp_core.resolve(jnp.asarray(A), jnp.asarray(f), "pinv"))
    qdd_c = np.asarray(rmp_core.resolve(jnp.asarray(A), jnp.asarray(f), "cholesky"))
    np.testing.assert_allclose(qdd_p, qdd_c, atol=1e-4)


@pytest.mark.slow
def test_analytic_derivatives_match_jacfwd_full_stack():
    """Full franka/06 policy stack: analytic vs jacfwd evaluation paths."""
    from rmp_tpu import envs
    from rmp_tpu.core import evaluate_policies
    from rmp_tpu.sim.world import sense

    env = envs.make("franka/06_cluttered_environment")
    state = env.reset(jax.random.PRNGKey(0))
    sim = state.sim
    q, qd, ctx = sense(env.model, sim)
    qd = jnp.asarray(rng.uniform(-0.5, 0.5, env.model.n_q), jnp.float32)
    ctxs = tuple(ctx.get(p.ctx_key) if p.ctx_key else None
                 for p in env.policies)
    params = env.gather_params()
    qdd_a = np.asarray(evaluate_policies(env.policies, q, qd, params, ctxs,
                                         "pinv", derivatives="analytic"))
    qdd_j = np.asarray(evaluate_policies(env.policies, q, qd, params, ctxs,
                                         "pinv", derivatives="jacfwd"))
    np.testing.assert_allclose(qdd_a, qdd_j, atol=1e-3)
    # and the fast resolves agree with pinv on this system
    qdd_c = np.asarray(evaluate_policies(env.policies, q, qd, params, ctxs,
                                         "cholesky", derivatives="analytic"))
    np.testing.assert_allclose(qdd_c, qdd_a, atol=1e-3)
    qdd_s = np.asarray(evaluate_policies(env.policies, q, qd, params, ctxs,
                                         "solve", derivatives="analytic"))
    np.testing.assert_allclose(qdd_s, qdd_a, atol=1e-3)


def test_lu_solve_unrolled_indefinite():
    """Pivoted unrolled LU matches pinv on indefinite invertible systems
    (the velocity-cap singular band regime)."""
    from rmp_tpu.ops.linalg import lu_solve_unrolled
    r = np.random.default_rng(17)
    for _ in range(10):
        A = r.normal(size=(9, 9)).astype(np.float32)
        A = A + A.T  # symmetric indefinite
        b = r.normal(size=9).astype(np.float32)
        got = np.asarray(lu_solve_unrolled(jnp.asarray(A), jnp.asarray(b)))
        want = np.linalg.solve(A.astype(np.float64), b.astype(np.float64))
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=1e-3)
    # batched
    A = r.normal(size=(32, 5, 5)).astype(np.float32)
    b = r.normal(size=(32, 5)).astype(np.float32)
    got = np.asarray(lu_solve_unrolled(jnp.asarray(A), jnp.asarray(b)))
    want = np.linalg.solve(A.astype(np.float64),
                           b.astype(np.float64)[..., None])[..., 0]
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-3)
