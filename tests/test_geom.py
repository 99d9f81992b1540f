"""Rotation/SE(3) math vs scipy ground truth (randomized, property-style).

Mirrors the reference test strategy (tests/test_kinematic_forwards.py): the
oracle there was scipy.spatial.transform.Rotation — same here.
"""
import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from rmp_tpu.ops import geom

rng = np.random.default_rng(0)


def test_elementary_rotations():
    angles = rng.uniform(-np.pi, np.pi, size=100).astype(np.float32)
    for fn, axis in [(geom.rot_x, "x"), (geom.rot_y, "y"), (geom.rot_z, "z")]:
        ours = np.asarray(fn(jnp.asarray(angles)))
        truth = Rotation.from_euler(axis, angles[:, None]).as_matrix()
        assert np.max(np.abs(ours - truth)) < 1e-6


def test_hom_and_inverse():
    R = Rotation.random(64, rng=rng).as_matrix().astype(np.float32)
    t = rng.uniform(-2, 2, size=(64, 3)).astype(np.float32)
    T = np.asarray(geom.hom(jnp.asarray(R), jnp.asarray(t)))
    assert T.shape == (64, 4, 4)
    np.testing.assert_allclose(T[:, :3, :3], R, atol=1e-7)
    np.testing.assert_allclose(T[:, :3, 3], t, atol=1e-7)
    np.testing.assert_allclose(T[:, 3], np.tile([0, 0, 0, 1], (64, 1)), atol=0)
    Tinv = np.asarray(geom.hom_inverse(jnp.asarray(T)))
    eye = np.einsum("bij,bjk->bik", T, Tinv)
    np.testing.assert_allclose(eye, np.tile(np.eye(4), (64, 1, 1)), atol=1e-5)


def test_axis_angle_vs_scipy():
    axes = rng.normal(size=(100, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    angles = rng.uniform(-np.pi, np.pi, size=100)
    ours = np.asarray(geom.rotation_matrix_from_axis_angle(
        jnp.asarray(axes, dtype=jnp.float32), jnp.asarray(angles, dtype=jnp.float32)))
    truth = Rotation.from_rotvec(axes * angles[:, None]).as_matrix()
    assert np.max(np.abs(ours - truth)) < 1e-5


def test_axis_angle_zero_axis_is_identity():
    R = np.asarray(geom.rotation_matrix_from_axis_angle(
        jnp.zeros((5, 3)), jnp.asarray(rng.uniform(-3, 3, 5), dtype=jnp.float32)))
    np.testing.assert_allclose(R, np.tile(np.eye(3), (5, 1, 1)), atol=1e-7)


def test_euler_roundtrip():
    # euler_from_rotation_matrix returns extrinsic-xyz angles
    eulers = rng.uniform(-1.4, 1.4, size=(200, 3)).astype(np.float32)
    R = Rotation.from_euler("xyz", eulers).as_matrix().astype(np.float32)
    ours = np.asarray(geom.euler_from_rotation_matrix(jnp.asarray(R)))
    R_back = Rotation.from_euler("xyz", ours).as_matrix()
    assert np.max(np.abs(R_back - R)) < 1e-5


def test_quaternion_conversions_roundtrip():
    quats = Rotation.random(100, rng=rng).as_quat().astype(np.float32)  # xyzw
    R_truth = Rotation.from_quat(quats).as_matrix()
    R_ours = np.asarray(geom.rotation_matrix_from_quaternion(jnp.asarray(quats)))
    assert np.max(np.abs(R_ours - R_truth)) < 1e-5
    q_back = np.asarray(geom.quaternion_from_rotation_matrix(jnp.asarray(
        R_truth.astype(np.float32))))
    # same rotation up to sign; we canonicalize w >= 0
    sign = np.sign(quats[:, 3:4])
    sign[sign == 0] = 1
    np.testing.assert_allclose(q_back, quats * sign, atol=1e-4)


def test_rpy_single_axis_matches_scipy():
    # all shipped assets have single-axis rpy, where reference/URDF
    # conventions coincide (see geom.rotation_matrix_from_rpy docstring)
    for axis in range(3):
        rpy = np.zeros((50, 3), dtype=np.float32)
        rpy[:, axis] = rng.uniform(-np.pi, np.pi, 50)
        ours = np.asarray(geom.rotation_matrix_from_rpy(jnp.asarray(rpy)))
        truth = Rotation.from_euler("xyz", rpy).as_matrix()
        assert np.max(np.abs(ours - truth)) < 1e-6


def test_transform_point_rotate_vector():
    R = Rotation.random(10, rng=rng).as_matrix().astype(np.float32)
    t = rng.uniform(-1, 1, size=(10, 3)).astype(np.float32)
    p = rng.uniform(-1, 1, size=(10, 3)).astype(np.float32)
    T = geom.hom(jnp.asarray(R), jnp.asarray(t))
    got = np.asarray(geom.transform_point(T, jnp.asarray(p)))
    want = np.einsum("bij,bj->bi", R, p) + t
    np.testing.assert_allclose(got, want, atol=1e-6)
    got_v = np.asarray(geom.rotate_vector(T, jnp.asarray(p)))
    np.testing.assert_allclose(got_v, np.einsum("bij,bj->bi", R, p), atol=1e-6)


def test_angular_velocity_to_euler_rates():
    # finite-difference oracle: euler(t) of a rotating frame
    e0 = np.array([0.3, -0.4, 0.8], dtype=np.float32)
    omega = np.array([0.2, -0.1, 0.4], dtype=np.float32)
    R0 = Rotation.from_euler("xyz", e0).as_matrix()
    eps = 1e-5
    dR = Rotation.from_rotvec(omega * eps).as_matrix()  # world-frame spin
    e1 = Rotation.from_matrix(dR @ R0).as_euler("xyz")
    rates_fd = (e1 - e0) / eps
    H = np.asarray(geom.angular_velocity_to_euler_rates_matrix(jnp.asarray(e0)))
    rates = H @ omega
    np.testing.assert_allclose(rates, rates_fd, atol=1e-3)


def test_everything_jits():
    @jax.jit
    def f(a, v):
        R = geom.rot_x(a) @ geom.rot_y(a) @ geom.rot_z(a)
        T = geom.hom(R, v)
        return (geom.euler_from_rotation_matrix(R),
                geom.quaternion_from_rotation_matrix(R),
                geom.transform_point(T, v))

    out = f(jnp.asarray([0.3]), jnp.asarray([[1.0, 2.0, 3.0]]))
    assert all(np.all(np.isfinite(np.asarray(o))) for o in out)
