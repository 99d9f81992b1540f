"""GJK convex closest-point queries (ops/gjk.py) + the hull collision mode.

Oracles: analytic point-to-box / point-to-cylinder distances, the
closed-form capsule query (sim/collision.py), convex-hull half-space
feasibility of the witness points (scipy), and capsule-mode rollouts.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rmp_tpu.ops import gjk
from rmp_tpu.sim import collision as C

CUBE = jnp.asarray([[x, y, z] for x in (-.5, .5) for y in (-.5, .5)
                    for z in (-.5, .5)], jnp.float32)


def test_cube_sphere_analytic():
    """Hull(cube) vs sphere == analytic box distance, to fp32 precision."""
    for c, r in [([2.0, 0, 0], 0.3), ([1.5, 1.5, 0], 0.2),
                 ([0.9, 0.9, 0.9], 0.1), ([3, -2, 1], 0.5)]:
        c = np.asarray(c, np.float32)
        sup_a = lambda d: gjk.support_hull(CUBE, d)
        sup_b = lambda d: gjk.support_sphere(jnp.asarray(c), jnp.asarray(r), d)
        pa, pb, n, dist, gap = gjk.closest_points(sup_a, sup_b,
                                                  jnp.asarray(c))
        exact = np.linalg.norm(np.maximum(np.abs(c) - 0.5, 0)) - r
        assert abs(float(dist) - exact) < 5e-5
        assert abs(float(gap)) < 1e-4
        # witness consistency
        assert abs(float(jnp.linalg.norm(pa - pb)) - float(dist)) < 1e-6


def test_hull_distance_gradient_matches_finite_differences():
    """support_hull's envelope custom_jvp makes the GJK distance exactly
    differentiable a.e.: grad of dist(hull translated by t, sphere) w.r.t.
    t must equal the central finite difference (and the analytic -normal
    direction) away from face/edge ties. This is what unblocks hull-mode
    gradient consumers (gain tuning) — the TPU variadic reduce has no
    autodiff rule of its own."""
    centers = np.asarray([[2.0, 0.7, 0.4], [1.3, 1.6, -0.9],
                          [-1.8, 1.1, 0.6]], np.float32)
    r = jnp.asarray(0.25)

    def dist_of(t, c):
        sup_a = lambda d: gjk.support_hull(CUBE + t, d)
        sup_b = lambda d: gjk.support_sphere(c, r, d)
        return gjk.closest_points(sup_a, sup_b, c - t, iters=32)[3]

    for c in centers:
        c = jnp.asarray(c)
        g = jax.grad(lambda t: dist_of(t, c))(jnp.zeros(3))
        # central differences (fp32: h large enough to dominate roundoff)
        h = 1e-3
        fd = np.zeros(3)
        for k in range(3):
            e = np.zeros(3, np.float32)
            e[k] = h
            fd[k] = (float(dist_of(jnp.asarray(e), c))
                     - float(dist_of(jnp.asarray(-e), c))) / (2 * h)
        np.testing.assert_allclose(np.asarray(g), fd, atol=2e-3)
        # envelope identity: ∂dist/∂t equals the contact normal (GJK's
        # smooth-contact convergence is linear, hence the ~1e-3 band)
        _, _, n, _, _ = gjk.closest_points(
            lambda d: gjk.support_hull(CUBE, d),
            lambda d: gjk.support_sphere(c, r, d), c, iters=32)
        np.testing.assert_allclose(np.asarray(g), np.asarray(n), atol=2e-3)
    # ∂s/∂verts path: tie-averaged selection tangent (non-zero verts
    # tangent exercises the non-symbolic-zero branch of the rule)
    jvp_out = jax.jvp(lambda v: gjk.support_hull(v, jnp.asarray([1., 0, 0])),
                      (CUBE,), (jnp.ones_like(CUBE),))[1]
    np.testing.assert_allclose(np.asarray(jvp_out), np.ones(3), atol=1e-6)


def test_capsule_capsule_matches_closed_form():
    """GJK on two capsules == the closed-form clamped-segment query."""
    rng = np.random.default_rng(0)
    B = 256
    a0 = rng.uniform(-1, 1, (B, 3)).astype(np.float32)
    a1 = a0 + rng.uniform(-0.5, 0.5, (B, 3)).astype(np.float32)
    ra = rng.uniform(0.02, 0.2, B).astype(np.float32)
    b0 = (rng.uniform(-1, 1, (B, 3)) + [2.5, 0, 0]).astype(np.float32)
    b1 = b0 + rng.uniform(-0.5, 0.5, (B, 3)).astype(np.float32)
    rb = rng.uniform(0.02, 0.2, B).astype(np.float32)
    _, _, _, d_ref = C.capsule_capsule_query(
        *map(jnp.asarray, (a0, a1, ra, b0, b1, rb)))
    sup_a = lambda d: gjk.support_capsule(jnp.asarray(a0), jnp.asarray(a1),
                                          jnp.asarray(ra), d)
    sup_b = lambda d: gjk.support_capsule(jnp.asarray(b0), jnp.asarray(b1),
                                          jnp.asarray(rb), d)
    _, _, _, dist, _ = gjk.closest_points(sup_a, sup_b, jnp.asarray(b0 - a0))
    np.testing.assert_allclose(np.asarray(dist), np.asarray(d_ref), atol=2e-4)


def test_cylinder_flat_caps_exact():
    """support_cylinder models the FLAT caps a capsule rounds off: a point
    straight above the rim is closer to the true cylinder than to the
    capsule approximation."""
    p0, p1, r = (jnp.asarray([0, 0, 0.]), jnp.asarray([0, 0, 1.]),
                 jnp.asarray(0.3))
    sup_cyl = lambda d: gjk.support_cylinder(p0, p1, r, d)
    for c, exact in [([0.0, 0.0, 1.5], 0.5), ([0.3, 0.0, 1.5], 0.5),
                     ([0.6, 0.0, 1.2], float(np.hypot(0.2, 0.3)))]:
        c = jnp.asarray(c, jnp.float32)
        sup_p = lambda d: gjk.support_sphere(c, jnp.asarray(0.0), d)
        _, _, _, dist, _ = gjk.closest_points(
            sup_cyl, sup_p, c - jnp.asarray([0, 0, 0.5]))
        assert abs(float(dist) - exact) < 1e-5


def test_overlap_reports_zero():
    sup_a = lambda d: gjk.support_hull(CUBE, d)
    sup_b = lambda d: gjk.support_sphere(jnp.asarray([0.2, 0.1, 0.0]),
                                         jnp.asarray(0.3), d)
    _, _, _, dist, _ = gjk.closest_points(sup_a, sup_b,
                                          jnp.asarray([1.0, 0, 0]))
    assert float(dist) < 1e-5


@pytest.fixture(scope="module")
def panda_hulls():
    from rmp_tpu.models import robots
    from rmp_tpu.models.hulls import hulls_for
    model = robots.franka_panda()
    hv = hulls_for(model)
    if hv is None:
        pytest.skip("no panda hull asset")
    return model, hv


@pytest.mark.slow
def test_hull_query_witnesses_feasible(panda_hulls):
    """robot_obstacle_distances_hull: distance == |pa - pb| with pa inside
    the link hull and pb on the obstacle surface (separated pairs)."""
    from scipy.spatial import ConvexHull

    from rmp_tpu.models import kinematics as K
    from rmp_tpu.sim.randomizer import randomize_obstacles
    model, hv = panda_hulls
    rng = np.random.default_rng(1)
    for trial in range(4):
        q = rng.uniform(np.asarray(model.q_lower),
                        np.asarray(model.q_upper)).astype(np.float32)
        obs = randomize_obstacles(jax.random.PRNGKey(trial), 2)
        # strip cylinder tags: this test's surface check is capsule-based
        obs = C.ObstacleSet(obs.p0, obs.p1, obs.radius)
        T_all = K.fk_all(model, jnp.asarray(q))
        pl, po, n, d = C.robot_obstacle_distances_hull(model, T_all, obs)
        pl, po, d = map(np.asarray, (pl, po, d))
        T = np.asarray(T_all, np.float64)
        b0 = np.asarray(obs.p0, np.float64)
        b1 = np.asarray(obs.p1, np.float64)
        rb = np.asarray(obs.radius, np.float64)
        for li, fi in enumerate(model.collision_frames):
            verts = (np.asarray(hv[li], np.float64) @ T[fi, :3, :3].T
                     + T[fi, :3, 3])
            eq = ConvexHull(verts).equations
            for k in range(obs.count):
                if d[li, k] <= 1e-3:      # hybrid capsule fallback regime
                    continue
                assert abs(np.linalg.norm(pl[li, k] - po[li, k])
                           - d[li, k]) < 1e-4
                # pa inside (or on) the hull
                assert (eq[:, :3] @ pl[li, k] + eq[:, 3]).max() < 1e-4
                # pb on the obstacle capsule surface
                seg = b1[k] - b0[k]
                t = np.clip(np.dot(po[li, k] - b0[k], seg)
                            / max(np.dot(seg, seg), 1e-12), 0, 1)
                dcap = np.linalg.norm(po[li, k] - (b0[k] + t * seg)) - rb[k]
                assert abs(dcap) < 1e-4


@pytest.mark.slow
def test_hull_distance_beats_vertex_bound(panda_hulls):
    """GJK distance <= the distance of every hull VERTEX to the obstacle
    (vertex sampling is an upper bound on the true hull distance)."""
    from rmp_tpu.models import kinematics as K
    from rmp_tpu.sim.randomizer import randomize_obstacles
    model, hv = panda_hulls
    q = jnp.zeros(model.n_q)
    obs = randomize_obstacles(jax.random.PRNGKey(7), 3)
    # strip cylinder tags: the vertex bound below is a capsule distance
    obs = C.ObstacleSet(obs.p0, obs.p1, obs.radius)
    T_all = K.fk_all(model, q)
    _, _, _, d = C.robot_obstacle_distances_hull(model, T_all, obs)
    T = np.asarray(T_all, np.float64)
    b0 = np.asarray(obs.p0); b1 = np.asarray(obs.p1)
    rb = np.asarray(obs.radius)
    for li, fi in enumerate(model.collision_frames):
        verts = (np.asarray(hv[li], np.float64) @ T[fi, :3, :3].T
                 + T[fi, :3, 3])
        for k in range(obs.count):
            seg = b1[k] - b0[k]
            denom = max(np.dot(seg, seg), 1e-12)
            t = np.clip((verts - b0[k]) @ seg / denom, 0, 1)
            dv = np.linalg.norm(verts - (b0[k] + t[:, None] * seg),
                                axis=-1).min() - rb[k]
            assert float(d[li, k]) <= dv + 1e-4


@pytest.mark.slow
def test_hull_mode_rollout_close_to_capsule():
    """collision_geometry='hull' runs end-to-end on the flagship env and
    stays finite + close to the capsule-mode trajectory over a short
    horizon (the geometries agree to ~mm, so early trajectories match)."""
    from rmp_tpu import envs
    env_h = envs.make("franka/06_cluttered_environment")
    if __import__("rmp_tpu.models.hulls", fromlist=["hulls_for"]).hulls_for(
            env_h.model) is None:
        pytest.skip("no panda hull asset")
    env_h.collision_geometry = "hull"
    env_c = envs.make("franka/06_cluttered_environment")
    states = envs.make_batched_reset(env_h, 4)(jax.random.PRNGKey(0))
    params = env_h.gather_params()
    fh, _ = jax.jit(envs.make_batched_rollout(env_h, 5))(states, params)
    fc, _ = jax.jit(envs.make_batched_rollout(env_c, 5))(states, params)
    qh, qc = np.asarray(fh.sim.q), np.asarray(fc.sim.q)
    assert np.isfinite(qh).all()
    assert np.abs(qh - qc).max() < 5e-3


@pytest.mark.slow
def test_hull_query_honors_cylinder_kinds(panda_hulls):
    """Cylinder-tagged obstacles get exact FLAT caps in hull mode: an
    obstacle whose cap faces a link reports MORE clearance than the
    capsule model (which rounds the cap outward by its radius)."""
    from rmp_tpu.models import kinematics as K
    model, _ = panda_hulls
    q = jnp.asarray(np.zeros(model.n_q), jnp.float32)
    T_all = K.fk_all(model, q)
    # vertical cylinder directly above the wrist, cap pointing down
    cyl = C.cylinder_obstacle([0.1, 0.0, 1.6], [0.0, 0.0, 0.0],
                              radius=0.2, height=0.4)
    assert cyl.kinds == ("cylinder",)
    _, _, _, d_cyl = C.robot_obstacle_distances_hull(model, T_all, cyl)
    capsule_only = C.ObstacleSet(cyl.p0, cyl.p1, cyl.radius)
    _, _, _, d_cap = C.robot_obstacle_distances_hull(model, T_all,
                                                     capsule_only)
    # for links under the cap, the flat model is FARTHER by up to r
    gain = np.asarray(d_cyl - d_cap)
    assert gain.max() > 0.05
    assert gain.min() > -1e-4          # flat caps never closer than round


@pytest.mark.slow
def test_self_distances_hull(panda_hulls):
    """Hull-vs-hull self-distance queries: witness consistency + close to
    the capsule result away from contact; franka/03 runs end-to-end with
    collision_geometry='hull'."""
    from rmp_tpu.models import kinematics as K
    model, _ = panda_hulls
    pairs = C.self_collision_pairs(model, n_neighbors=3)
    T_all = K.fk_all(model, jnp.zeros(model.n_q))
    pl, po, n, d = C.robot_self_distances_hull(model, T_all, pairs)
    _, _, _, d_cap = C.robot_self_distances(model, T_all, pairs)
    d, d_cap = np.asarray(d), np.asarray(d_cap)
    pl, po = np.asarray(pl), np.asarray(po)
    sep = d > 1e-3
    assert sep.any()
    np.testing.assert_allclose(
        np.linalg.norm(pl - po, axis=-1)[sep], d[sep], atol=1e-4)
    # hulls and fitted capsules agree to a few cm on link-link distances
    assert np.abs(d - d_cap)[sep].max() < 0.05

    from rmp_tpu import envs
    env = envs.make("franka/03_self_avoidance")
    env.collision_geometry = "hull"
    states = envs.make_batched_reset(env, 2)(jax.random.PRNGKey(0))
    f, _ = jax.jit(envs.make_batched_rollout(env, 3))(states,
                                                      env.gather_params())
    assert np.isfinite(np.asarray(f.sim.q)).all()


@pytest.mark.slow
def test_two_joint_hull_mode():
    """Synthesized primitive hulls for the TwoJointRobot: hull-mode
    distances match analytic box-to-obstacle distance at a known pose and
    the obstacle-avoidance env runs end-to-end."""
    from rmp_tpu.models import kinematics as K
    from rmp_tpu.models import robots
    model = robots.two_joint_robot()
    T_all = K.fk_all(model, jnp.zeros(model.n_q))
    # sphere obstacle directly above link_1's midpoint: the link frame
    # sits at z=0.075, box z in +-0.025 -> top at 0.1; exact = 0.5-0.1-0.1
    obs = C.sphere_obstacle([0.5, 0.0, 0.5], 0.1)
    _, _, _, d = C.robot_obstacle_distances_hull(model, T_all, obs)
    exact = 0.5 - (0.075 + 0.025) - 0.1
    assert abs(float(d[0, 0]) - exact) < 1e-3
    # capsule mode rounds the box: reports LESS clearance above the face
    _, _, _, d_cap = C.robot_obstacle_distances(model, T_all, obs)
    assert float(d_cap[0, 0]) < float(d[0, 0])

    from rmp_tpu import envs
    env = envs.make("two_joint/05_obstacle_avoidance")
    env.collision_geometry = "hull"
    states = envs.make_batched_reset(env, 4)(jax.random.PRNGKey(0))
    f, _ = jax.jit(envs.make_batched_rollout(env, 5))(states,
                                                      env.gather_params())
    assert np.isfinite(np.asarray(f.sim.q)).all()


def test_hulls_for_dual_alias(panda_hulls):
    """hulls_for resolves dual-Panda links through the L_/R_ prefix alias
    into the single-Panda npz asset."""
    from rmp_tpu.models import robots
    from rmp_tpu.models.hulls import hulls_for
    dual = robots.dual_panda()
    hv = hulls_for(dual)
    assert hv is not None
    assert hv.shape[0] == len(dual.collision_frames)
    # L_ and R_ copies of the same link share the same local hull table
    single, _ = panda_hulls
    row = {dual.link_names[f]: i
           for i, f in enumerate(dual.collision_frames)}
    np.testing.assert_array_equal(hv[row["L_panda_hand"]],
                                  hv[row["R_panda_hand"]])
