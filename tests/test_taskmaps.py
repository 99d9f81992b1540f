"""Taskmap algebra tests: chain-rule consistency, library maps, shapes."""
import jax
import jax.numpy as jnp
import numpy as np

from rmp_tpu import taskmaps as tm
from rmp_tpu.models import robots
from rmp_tpu.ops import geom

rng = np.random.default_rng(2)


def test_identity_differentiate():
    q = jnp.asarray(rng.uniform(-1, 1, 5), jnp.float32)
    qd = jnp.asarray(rng.uniform(-1, 1, 5), jnp.float32)
    x, xd, J, c = tm.differentiate(tm.identity(), q, qd)
    np.testing.assert_allclose(np.asarray(x), np.asarray(q)[None], atol=0)
    np.testing.assert_allclose(np.asarray(xd), np.asarray(qd)[None], atol=0)
    np.testing.assert_allclose(np.asarray(J)[0], np.eye(5), atol=0)
    np.testing.assert_allclose(np.asarray(c), np.zeros((1, 5)), atol=0)


def test_chain_rule_matches_manual_composition():
    """Autodiff of the composite == the reference's manual chain rule
    J = J2 J1, c = c2 + J2 c1, xd = J2 xd1 (taskmap.py:150-160)."""
    model = robots.franka_panda()
    f1 = tm.fk_frame(model, robots.PANDA_EE_FRAME)
    f2 = tm.to_position()
    composite = tm.chain(f1, f2)

    q = jnp.asarray(rng.uniform(-1.5, 1.5, model.n_q), jnp.float32)
    qd = jnp.asarray(rng.uniform(-1, 1, model.n_q), jnp.float32)

    x, xd, J, c = tm.differentiate(composite, q, qd)

    # manual: differentiate stage 1, then stage 2 at x1 with velocity xd1
    x1, xd1, J1, c1 = tm.differentiate(f1, q, qd)
    from rmp_tpu.models.kinematics import differentiate as diff_fn
    g = lambda v: f2(v[None, :], None)[0]
    x2, xd2, J2, c2 = diff_fn(g, x1[0], xd1[0])

    np.testing.assert_allclose(np.asarray(x)[0], np.asarray(x2), atol=1e-6)
    J_manual = np.asarray(J2) @ np.asarray(J1)[0]
    np.testing.assert_allclose(np.asarray(J)[0], J_manual, atol=1e-5)
    c_manual = np.asarray(c2) + np.asarray(J2) @ np.asarray(c1)[0]
    np.testing.assert_allclose(np.asarray(c)[0], c_manual, atol=1e-4)
    np.testing.assert_allclose(np.asarray(xd)[0],
                               np.asarray(J2) @ np.asarray(xd1)[0], atol=1e-5)


def test_to_euler_to_quaternion():
    model = robots.franka_panda()
    ee = model.frame_index(robots.PANDA_EE_FRAME)
    q = jnp.asarray(rng.uniform(-1, 1, model.n_q), jnp.float32)
    f16 = tm.fk_frame(model, ee)(q, None)
    R = np.asarray(f16).reshape(4, 4)[:3, :3]
    eul = np.asarray(tm.to_euler()(f16, None))[0]
    from scipy.spatial.transform import Rotation
    np.testing.assert_allclose(
        Rotation.from_euler("xyz", eul).as_matrix(), R, atol=1e-5)
    quat = np.asarray(tm.to_quaternion()(f16, None))[0]
    np.testing.assert_allclose(
        Rotation.from_quat(quat).as_matrix(), R, atol=1e-4)


def test_relative_offsets():
    model = robots.two_joint_robot()
    ee = model.frame_index("link_23")
    q = jnp.asarray(rng.uniform(-1, 1, 2), jnp.float32)
    offs = jnp.asarray(rng.uniform(-0.3, 0.3, (4, 3)), jnp.float32)
    ctx = {"relative_position": offs}
    m = tm.chain(tm.fk_frame(model, ee), tm.relative_offsets(), tm.to_position())
    out = np.asarray(m(q, ctx))
    assert out.shape == (4, 3)
    T = np.asarray(tm.fk_frame(model, ee)(q, None)).reshape(4, 4)
    want = (T[:3, :3] @ np.asarray(offs).T).T + T[:3, 3]
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_relative_points_equals_chain():
    """The fused relative_points / frames_relative_points maps match the
    chain(relative_offsets/frames_relative_offsets, to_position) composition
    they replace in the envs — values AND full (x, xd, J, c) derivatives."""
    model = robots.two_joint_robot()
    ee = model.frame_index("link_23")
    q = jnp.asarray(rng.uniform(-1, 1, 2), jnp.float32)
    qd = jnp.asarray(rng.uniform(-1, 1, 2), jnp.float32)
    offs = jnp.asarray(rng.uniform(-0.3, 0.3, (4, 3)), jnp.float32)
    ctx = {"relative_position": offs}
    old = tm.chain(tm.fk_frame(model, ee), tm.relative_offsets(),
                   tm.to_position())
    new = tm.chain(tm.fk_frame(model, ee), tm.relative_points())
    for a, b in zip(tm.differentiate(old, q, qd, ctx),
                    tm.differentiate(new, q, qd, ctx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # grouped form over all collision frames
    frames = model.collision_frames
    offs_g = jnp.asarray(rng.uniform(-0.3, 0.3, (len(frames), 3, 3)),
                         jnp.float32)
    ctx_g = {"relative_position": offs_g}
    old_g = tm.chain(tm.multi_fk_frames(model, frames),
                     tm.frames_relative_offsets(), tm.to_position())
    new_g = tm.chain(tm.multi_fk_frames(model, frames),
                     tm.frames_relative_points())
    for a, b in zip(tm.differentiate(old_g, q, qd, ctx_g),
                    tm.differentiate(new_g, q, qd, ctx_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_frame_to_point_distance_value_and_gradient():
    """Distance value == euclidean distance; Jacobian treats the body point as
    rigidly attached (stop_gradient on the offset, ref taskmap.py:126)."""
    model = robots.two_joint_robot()
    ee = model.frame_index("link_23")
    q = jnp.asarray([0.3, -0.4], jnp.float32)
    T = np.asarray(tm.fk_frame(model, ee)(q, None)).reshape(4, 4)
    p_joint = T[:3, 3]
    pos_on_link = p_joint + np.array([0.05, 0.02, 0.0], dtype=np.float32)
    pos_on_obstacle = np.array([1.5, 0.5, 0.1], dtype=np.float32)
    ctx = {"pos_on_link": jnp.asarray(pos_on_link)[None],
           "pos_on_obstacle": jnp.asarray(pos_on_obstacle)[None]}
    m = tm.chain(tm.fk_frame(model, ee), tm.frame_to_point_distance())
    d = np.asarray(m(q, ctx))
    np.testing.assert_allclose(
        d[0, 0], np.linalg.norm(pos_on_link - pos_on_obstacle), atol=1e-6)
    # gradient: d decreases when the joint moves the attached point toward obs
    x, xd, J, c = tm.differentiate(m, q, jnp.zeros(2), ctx)
    assert np.asarray(J).shape == (1, 1, 2)
    # numeric check of J via the frozen-point model: gradient of
    # ||p_joint(q) + offset - p_obs|| with constant offset
    offset = jnp.asarray(pos_on_link - p_joint)
    frozen = lambda qq: jnp.linalg.norm(
        tm.fk_frame(model, ee)(qq, None).reshape(4, 4)[:3, 3]
        + offset - jnp.asarray(pos_on_obstacle))[None, None]
    J_frozen = np.asarray(jax.jacfwd(frozen)(q))
    np.testing.assert_allclose(np.asarray(J), J_frozen.reshape(1, 1, 2),
                               atol=1e-5)
