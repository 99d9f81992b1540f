"""Collision distance query tests: closed-form oracles + brute-force sampling."""
import jax
import jax.numpy as jnp
import numpy as np

from rmp_tpu.models import kinematics as K
from rmp_tpu.models import robots
from rmp_tpu.sim import collision as C
import pytest

rng = np.random.default_rng(5)


def _j(x):
    return jnp.asarray(x, jnp.float32)


def test_sphere_sphere():
    a = C.sphere_obstacle([0, 0, 0], 0.1)
    pos_a, pos_b, n, d = C.capsule_capsule_query(
        _j([[1.0, 0, 0]]), _j([[1.0, 0, 0]]), _j([0.2]),
        a.p0, a.p1, a.radius)
    np.testing.assert_allclose(float(d[0]), 1.0 - 0.3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(n)[0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(pos_a)[0], [0.8, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(pos_b)[0], [0.1, 0, 0], atol=1e-6)


def test_capsule_sphere_endpoint_and_interior():
    # capsule along x from 0 to 1, radius 0.1; sphere at (0.5, 0.5, 0) r=0.05
    pa, pb, n, d = C.capsule_capsule_query(
        _j([0, 0, 0]), _j([1, 0, 0]), _j(0.1),
        _j([0.5, 0.5, 0]), _j([0.5, 0.5, 0]), _j(0.05))
    np.testing.assert_allclose(float(d), 0.5 - 0.15, atol=1e-6)
    np.testing.assert_allclose(np.asarray(n), [0, -1, 0], atol=1e-5)
    # sphere beyond endpoint: closest at the cap
    pa, pb, n, d = C.capsule_capsule_query(
        _j([0, 0, 0]), _j([1, 0, 0]), _j(0.1),
        _j([2.0, 0, 0]), _j([2.0, 0, 0]), _j(0.05))
    np.testing.assert_allclose(float(d), 1.0 - 0.15, atol=1e-6)


def test_segment_segment_brute_force():
    """Random segment pairs: closed form vs dense parameter sampling."""
    for _ in range(50):
        a0, a1, b0, b1 = rng.uniform(-1, 1, (4, 3)).astype(np.float32)
        s, t = C.segment_closest_params(_j(a0), _j(a1), _j(b0), _j(b1))
        ca = a0 + float(s) * (a1 - a0)
        cb = b0 + float(t) * (b1 - b0)
        d = np.linalg.norm(ca - cb)
        ss, tt = np.meshgrid(np.linspace(0, 1, 101), np.linspace(0, 1, 101))
        pa = a0[None, None] + ss[..., None] * (a1 - a0)[None, None]
        pb = b0[None, None] + tt[..., None] * (b1 - b0)[None, None]
        d_brute = np.linalg.norm(pa - pb, axis=-1).min()
        assert d <= d_brute + 2e-3, (d, d_brute)


def test_penetration_negative_distance():
    _, _, _, d = C.capsule_capsule_query(
        _j([0, 0, 0]), _j([1, 0, 0]), _j(0.3),
        _j([0.5, 0.2, 0]), _j([0.5, 0.2, 0]), _j(0.2))
    assert float(d) < 0  # 0.2 center distance < 0.5 radii sum


def test_cylinder_obstacle_orientation():
    obs = C.cylinder_obstacle([0, 0, 0.5], [np.pi / 2, 0, 0], radius=0.05,
                              height=0.4)
    # rotated pi/2 about x: axis z -> -y... axis direction R @ z
    axis = np.asarray(obs.p1 - obs.p0)[0]
    np.testing.assert_allclose(axis, [0, -0.4, 0], atol=1e-6)


def test_robot_obstacle_distances_shapes_and_sanity():
    model = robots.franka_panda()
    q = _j(robots.PANDA_Q_READY)
    T_all = K.fk_all(model, q)
    obs = C.ObstacleSet.of(C.sphere_obstacle([0.5, 0.0, 0.5], 0.05),
                           C.sphere_obstacle([5.0, 5.0, 5.0], 0.05))
    pos_l, pos_o, n, d = C.robot_obstacle_distances(model, T_all, obs)
    L = len(model.collision_frames)
    assert d.shape == (L, 2)
    # the far obstacle is ~8.6m away from everything
    assert np.all(np.asarray(d)[:, 1] > 7.0)
    # near obstacle: all distances < 1.5 m, none hugely negative
    assert np.all(np.asarray(d)[:, 0] < 1.5)
    # normals are unit vectors
    np.testing.assert_allclose(np.linalg.norm(np.asarray(n), axis=-1),
                               np.ones((L, 2)), atol=1e-4)
    # pos_on_link is on the link capsule surface: |pos_l - pos_o| == d (+radii
    # consistency): center-dist = d + ra + rb by construction
    gap = np.linalg.norm(np.asarray(pos_l) - np.asarray(pos_o), axis=-1)
    np.testing.assert_allclose(gap, np.abs(np.asarray(d)), atol=1e-5)


@pytest.mark.slow
def test_distances_differentiable_through_fk():
    """d(q) must have nonzero, finite gradients (drives obstacle policies)."""
    model = robots.two_joint_robot()
    obs = C.sphere_obstacle([1.5, 0.5, 0.1], 0.1)

    def min_dist(q):
        T_all = K.fk_all(model, q)
        _, _, _, d = C.robot_obstacle_distances(model, T_all, obs)
        return jnp.min(d)

    g = np.asarray(jax.grad(min_dist)(_j([0.3, 0.2])))
    assert np.all(np.isfinite(g))
    assert np.linalg.norm(g) > 1e-3


def test_self_collision_pairs_exclude_neighbors():
    model = robots.franka_panda()
    pairs = C.self_collision_pairs(model, n_neighbors=3)
    assert len(pairs) > 0
    chains = {i: model.chain(i) for i in range(model.n_frames)}
    for a, b in pairs:
        assert a not in chains[b][-4:]
        assert b not in chains[a][-4:]
    # query executes and returns finite distances
    T_all = K.fk_all(model, _j(robots.PANDA_Q_READY))
    _, _, _, d = C.robot_self_distances(model, T_all, pairs)
    assert np.all(np.isfinite(np.asarray(d)))


def test_multi_primitive_link_takes_closest():
    """Links with several collision primitives report the closest one per
    obstacle (PyBullet single-closest-point semantics)."""
    from rmp_tpu.models.specs import (JointSpec, LinkSpec, RobotSpec,
                                      build_model)
    from rmp_tpu.models.urdf import CollisionPrimitive

    # one link with TWO capsules: along +x and along +y
    spec = RobotSpec(
        name="elbow",
        links=(LinkSpec("base"),
               LinkSpec("l1", 1.0, (0, 0, 0), (0.1,) * 3 + (0.0,) * 3,
                        (CollisionPrimitive("capsule", (0, 0, 0), (1, 0, 0), 0.05),
                         CollisionPrimitive("capsule", (0, 0, 0), (0, 1, 0), 0.05)))),
        joints=(JointSpec("j1", "revolute", "base", "l1", axis=(0, 0, 1),
                          lower=-3, upper=3),))
    model = build_model(spec)
    q = jnp.zeros(1)
    T_all = K.fk_all(model, q)
    # obstacle near the +y arm tip: the y-capsule must win
    obs = C.sphere_obstacle([0.1, 1.0, 0.3], 0.05)
    pos_l, pos_o, n, d = C.robot_obstacle_distances(model, T_all, obs)
    assert d.shape == (1, 1)
    # closest point should be near the y-arm (pos_on_link y ~ 1.0 region)
    pl = np.asarray(pos_l)[0, 0]
    assert pl[1] > 0.5, f"picked wrong primitive: {pl}"
    # distance matches a direct y-capsule query
    _, _, _, d_direct = C.capsule_capsule_query(
        jnp.asarray([0.0, 0, 0]), jnp.asarray([0.0, 1, 0]), jnp.asarray(0.05),
        jnp.asarray([0.1, 1.0, 0.3]), jnp.asarray([0.1, 1.0, 0.3]),
        jnp.asarray(0.05))
    np.testing.assert_allclose(float(d[0, 0]), float(d_direct), atol=1e-6)


def test_obstacle_set_kinds_concat():
    """ObstacleSet.of merges kind tags; None members become 'capsule'."""
    from rmp_tpu.sim.collision import (ObstacleSet, cylinder_obstacle,
                                       sphere_obstacle)
    cyl = cylinder_obstacle([0, 0, 0.5], [0, 0, 0], radius=0.1, height=0.4)
    sph = sphere_obstacle([1, 0, 0.5], 0.2)
    both = ObstacleSet.of(cyl, sph)
    assert both.count == 2
    assert both.kinds == ("cylinder", "capsule")
    # all-None stays None (no tags invented)
    plain = ObstacleSet.of(sph, sph)
    assert plain.kinds is None
    # pytree round-trip preserves the static tags
    leaves, treedef = jax.tree.flatten(both)
    assert jax.tree.unflatten(treedef, leaves).kinds == both.kinds


def test_ur5_hull_mode():
    """Hull tier covers the UR5: its capsule spec IS its collision
    definition (no reference meshes), so hulls are synthetic capsule
    polytopes (models/hulls._ur5_hulls) — INNER approximations, distances
    may only overestimate the capsule distance, by <= ~2 mm."""
    from rmp_tpu.models import kinematics as K
    from rmp_tpu.models import robots
    from rmp_tpu.models.hulls import hulls_for

    model = robots.ur5()
    hv = hulls_for(model)
    assert hv is not None and hv.shape[0] == len(model.collision_frames)
    rng = np.random.default_rng(3)
    for _ in range(5):
        q = jnp.asarray(rng.uniform(-3, 3, model.n_q), jnp.float32)
        T_all = K.fk_all(model, q)
        c = rng.uniform(-0.8, 0.8, 3)
        c[2] = abs(c[2])
        obs = C.ObstacleSet(jnp.asarray([c], jnp.float32),
                            jnp.asarray([c + np.asarray([0, 0, 0.3])],
                                        jnp.float32),
                            jnp.asarray([0.05], jnp.float32))
        _, _, _, dc = C.robot_obstacle_distances(model, T_all, obs)
        _, _, _, dh = C.robot_obstacle_distances_hull(model, T_all, obs)
        dc, dh = np.asarray(dc), np.asarray(dh)
        free = dh > 1e-3                     # outside the hybrid handoff
        assert (dh[free] >= dc[free] - 1e-4).all()      # inner approx
        assert (dh[free] - dc[free] <= 2.5e-3).all()    # deviation bound


def test_fine_capsule_spec_builds_and_stays_close():
    """The opt-in 47-primitive FINE table (specs.with_fine_capsules /
    RMP_PANDA_CAPS=fine) builds a working model whose obstacle distances
    track the default 25-primitive set within the fit tolerances (both
    approximate the same meshes; measured behavior-flat at defaults —
    DESIGN.md §12)."""
    from rmp_tpu.models import robots
    from rmp_tpu.models.specs import (PANDA_SPEC, build_model,
                                      with_fine_capsules)

    fine = build_model(with_fine_capsules(PANDA_SPEC))
    coarse = robots.franka_panda()
    n_fine = sum(len(fine.collision[i]) for i in fine.collision_frames)
    n_coarse = sum(len(coarse.collision[i])
                   for i in coarse.collision_frames)
    assert n_fine == 47 and n_coarse == 25
    assert fine.collision_frames == coarse.collision_frames

    rng = np.random.default_rng(0)
    for _ in range(3):
        q = jnp.asarray(rng.uniform(-1.5, 1.5, coarse.n_q), jnp.float32)
        c = np.asarray([0.5, 0.1, 0.5]) + rng.uniform(-0.2, 0.2, 3)
        obs = C.ObstacleSet(jnp.asarray([c], jnp.float32),
                            jnp.asarray([c + np.asarray([0, 0, 0.4])],
                                        jnp.float32),
                            jnp.asarray([0.06], jnp.float32))
        df = C.robot_obstacle_distances(
            fine, K.fk_all(fine, q), obs)[3]
        dc = C.robot_obstacle_distances(
            coarse, K.fk_all(coarse, q), obs)[3]
        # per-frame closest distances agree within the two fits' combined
        # padding/protrusion envelope (~2 cm)
        assert np.abs(np.asarray(df) - np.asarray(dc)).max() < 0.025
