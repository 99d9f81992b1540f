"""FK + derivative tests.

Oracles (no PyBullet in this environment, SURVEY.md §4 adaptation):
  1. analytic planar 2-link formulas (closed form),
  2. finite differences for J / xd / curvature,
  3. spec -> URDF -> parse round-trip (parser parity with direct build).
"""
import jax
import jax.numpy as jnp
import numpy as np

from rmp_tpu.models import kinematics as K
from rmp_tpu.models import robots
from rmp_tpu.models.specs import TWO_JOINT_SPEC, PANDA_SPEC, build_model, write_urdf
from rmp_tpu.models.urdf import parse_urdf
import pytest

rng = np.random.default_rng(1)


def _analytic_two_link_ee(q):
    """EE ('link_23') world position of the planar arm, closed form.

    Chain: base->joint_1 at z=0.075 (Rz q1), link_1 length 1.0 (+z 0.05 at
    joint_2), link_2 length 1.0 to fixed frame link_23.
    """
    q1, q2 = q
    x = np.cos(q1) + np.cos(q1 + q2)
    y = np.sin(q1) + np.sin(q1 + q2)
    z = 0.075 + 0.05
    return np.array([x, y, z])


def test_two_joint_fk_vs_analytic():
    model = robots.two_joint_robot()
    ee = model.frame_index("link_23")
    for _ in range(100):
        q = rng.uniform(-np.pi, np.pi, 2).astype(np.float32)
        T = np.asarray(K.fk_frame(model, jnp.asarray(q), ee))
        np.testing.assert_allclose(T[:3, 3], _analytic_two_link_ee(q),
                                   atol=1e-5)
        # rotation is Rz(q1+q2)
        c, s = np.cos(q.sum()), np.sin(q.sum())
        np.testing.assert_allclose(
            T[:3, :3], np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]]), atol=1e-5)


def test_fk_all_matches_fk_frame():
    model = robots.franka_panda()
    q = rng.uniform(-1, 1, model.n_q).astype(np.float32)
    T_all = np.asarray(K.fk_all(model, jnp.asarray(q)))
    for i in range(model.n_frames):
        Ti = np.asarray(K.fk_frame(model, jnp.asarray(q), i))
        np.testing.assert_allclose(T_all[i], Ti, atol=1e-5)


def test_panda_fk_known_pose():
    """EE position at q=0 (all joints zero) from the DH-chain by hand.

    At q=0 the panda chain gives z = 0.333 + 0.316 + 0.384 + 0.107 + 0.0584
    + ... — rather than hand-deriving all frames, we check invariants:
    the base frame, the monotone chain along z at the zero pose of joints
    with zero xyz offsets, and that the grasp frame sits 0.105+0.0584 above
    panda_link8... Simplest robust check: panda_joint1 frame is at
    (0,0,0.333) with identity rotation.
    """
    model = robots.franka_panda()
    q = np.zeros(model.n_q, dtype=np.float32)
    T_all = np.asarray(K.fk_all(model, jnp.asarray(q)))
    j1 = model.frame_index("panda_joint1")
    np.testing.assert_allclose(T_all[j1], np.array(
        [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0.333], [0, 0, 0, 1]],
        dtype=np.float32), atol=1e-6)
    # ready pose EE (cross-checked against the reference experiment setups:
    # goals around [0.6, 0, 0.4] are reachable from q_ready ~ 0.3-0.6m out)
    T_ee = np.asarray(K.fk_frame(
        model, jnp.asarray(robots.PANDA_Q_READY),
        model.frame_index(robots.PANDA_EE_FRAME)))
    assert 0.2 < T_ee[0, 3] < 0.6
    assert abs(T_ee[1, 3]) < 0.05
    assert 0.3 < T_ee[2, 3] < 0.8


def _fd_jacobian(fn, q, eps=1e-4):
    x0 = np.asarray(fn(jnp.asarray(q)))
    J = np.zeros(x0.shape + q.shape)
    for j in range(q.size):
        dq = q.copy()
        dq[j] += eps
        J[..., j] = (np.asarray(fn(jnp.asarray(dq))) - x0) / eps
    return J


def test_differentiate_jacobian_vs_fd():
    model = robots.franka_panda()
    ee = model.frame_index(robots.PANDA_EE_FRAME)
    fn = jax.jit(lambda qq: K.fk_frame(model, qq, ee)[:3, 3])
    diff = jax.jit(lambda qq, qqd: K.differentiate(fn, qq, qqd))
    for _ in range(3):
        q = rng.uniform(-1.5, 1.5, model.n_q).astype(np.float32)
        qd = rng.uniform(-1, 1, model.n_q).astype(np.float32)
        x, xd, J, c = diff(jnp.asarray(q), jnp.asarray(qd))
        J_fd = _fd_jacobian(fn, q)
        np.testing.assert_allclose(np.asarray(J), J_fd, atol=5e-3)
        np.testing.assert_allclose(np.asarray(xd), J_fd @ qd, atol=5e-3)


@pytest.mark.slow
def test_curvature_vs_fd():
    """c = J̇ q̇ via finite differences along the flow q(t) = q + t q̇."""
    model = robots.two_joint_robot()
    ee = model.frame_index("link_23")
    fn = lambda qq: K.fk_frame(model, qq, ee)[:3, 3]
    q = rng.uniform(-2, 2, 2).astype(np.float32)
    qd = rng.uniform(-1, 1, 2).astype(np.float32)
    _, _, _, c = K.differentiate(fn, jnp.asarray(q), jnp.asarray(qd))
    # exact xd(q) = jvp along fixed qd; c = d/dt xd(q + t qd) at t=0
    xd_exact = jax.jit(lambda qq: jax.jvp(fn, (qq,), (jnp.asarray(qd),))[1])
    eps = 1e-3
    c_fd = (np.asarray(xd_exact(jnp.asarray(q + eps * qd)))
            - np.asarray(xd_exact(jnp.asarray(q - eps * qd)))) / (2 * eps)
    np.testing.assert_allclose(np.asarray(c), c_fd, atol=5e-3)


def test_urdf_roundtrip(tmp_path):
    for spec in (TWO_JOINT_SPEC, PANDA_SPEC):
        path = str(tmp_path / f"{spec.name}.urdf")
        write_urdf(spec, path)
        direct = build_model(spec)
        parsed = parse_urdf(path)
        assert parsed.frame_names == direct.frame_names
        assert parsed.parent == direct.parent
        assert parsed.joint_type == direct.joint_type
        assert parsed.q_index == direct.q_index
        assert parsed.motor_names == direct.motor_names
        np.testing.assert_allclose(parsed.T_constant, direct.T_constant, atol=1e-6)
        np.testing.assert_allclose(parsed.axis, direct.axis, atol=0)
        np.testing.assert_allclose(parsed.mass, direct.mass, atol=0)
        np.testing.assert_allclose(parsed.com, direct.com, atol=0)
        np.testing.assert_allclose(parsed.inertia, direct.inertia, atol=1e-7)
        np.testing.assert_allclose(parsed.q_lower, direct.q_lower, atol=0)
        np.testing.assert_allclose(parsed.q_upper, direct.q_upper, atol=0)
        # FK parity between parsed and direct models
        q = rng.uniform(-1, 1, direct.n_q).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(K.fk_all(parsed, jnp.asarray(q))),
            np.asarray(K.fk_all(direct, jnp.asarray(q))), atol=1e-6)


def test_fk_vmaps_and_jits():
    model = robots.franka_panda()
    qs = jnp.asarray(rng.uniform(-1, 1, (32, model.n_q)), dtype=jnp.float32)
    fk = jax.jit(jax.vmap(lambda q: K.fk_all(model, q)))
    out = np.asarray(fk(qs))
    assert out.shape == (32, model.n_frames, 4, 4)
    assert np.all(np.isfinite(out))
    # batch consistency with single-q path
    np.testing.assert_allclose(
        out[3], np.asarray(K.fk_all(model, qs[3])), atol=1e-6)


def test_chain_and_collision_frames():
    model = robots.franka_panda()
    assert model.n_q == 9
    assert model.n_frames == 12
    ee = model.frame_index(robots.PANDA_EE_FRAME)
    chain = model.chain(ee)
    # root->ee chain goes through joints 1..8, hand, grasptarget
    assert chain[0] == model.frame_index("panda_joint1")
    assert chain[-1] == ee
    assert len(chain) == 10
    # 10 collision frames: joints 1-7, hand, both fingers (link8 and
    # grasptarget carry no collision geometry)
    assert len(model.collision_frames) == 10


def test_fk_jit_cache_keyed_by_structure():
    """Regression (VERDICT r1 weak #7): the fk_all_jit cache was keyed by
    id(model) — aliasing after GC and growing per model INSTANCE. It must be
    bounded by distinct model structures: rebuilding the same robot reuses
    one compiled entry, and results stay identical."""
    import jax.numpy as jnp

    from rmp_tpu.models import kinematics as K

    before = len(K._FK_JIT_CACHE)
    outs = []
    for _ in range(5):
        m = robots.franka_panda()        # fresh instance each time
        outs.append(np.asarray(K.fk_all_jit(m, jnp.zeros(m.n_q))))
    assert len(K._FK_JIT_CACHE) <= before + 1
    for o in outs[1:]:
        np.testing.assert_array_equal(outs[0], o)


def test_make_dual_spec_composition():
    """make_dual_spec: composed tree has both arms' DOF, all frames, and
    the single robot's joint limits under each prefix."""
    import numpy as np

    from rmp_tpu.models import robots
    dual = robots.dual_panda()
    single = robots.franka_panda()
    assert dual.n_q == 2 * single.n_q
    assert dual.n_frames == 2 * single.n_frames + 2   # + two base mounts
    lim = dict(zip(dual.motor_names, np.asarray(dual.q_lower)))
    lim_s = dict(zip(single.motor_names, np.asarray(single.q_lower)))
    for name, lo in lim.items():
        assert lo == lim_s[name[2:]]


def test_make_multi_spec_three_arms():
    """N-robot composition: three Pandas on one tree, FK of each copy equals
    the single-arm FK under its own base transform."""
    import numpy as np

    from rmp_tpu.models import robots
    from rmp_tpu.models.kinematics import fk_all
    from rmp_tpu.models.specs import PANDA_SPEC, build_model, make_multi_spec
    spec = make_multi_spec(
        PANDA_SPEC,
        offsets=((0.6, 0, 0), (-0.3, 0.52, 0), (-0.3, -0.52, 0)),
        yaws=(np.pi, -np.pi / 3, np.pi / 3),
        prefixes=("A_", "B_", "C_"))
    m = build_model(spec)
    single = robots.franka_panda()
    assert m.n_q == 3 * single.n_q
    q = np.zeros(m.n_q, np.float32)
    T = np.asarray(fk_all(m, jnp.asarray(q)), np.float64)
    Ts = np.asarray(fk_all(single, jnp.zeros(single.n_q)), np.float64)
    ee_s = Ts[single.frame_index("panda_grasptarget_hand")][:3, 3]
    for prefix, off, yaw in zip(("A_", "B_", "C_"),
                                ((0.6, 0, 0), (-0.3, 0.52, 0),
                                 (-0.3, -0.52, 0)),
                                (np.pi, -np.pi / 3, np.pi / 3)):
        c, s = np.cos(yaw), np.sin(yaw)
        R = np.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        ee = T[m.frame_index(prefix + "panda_grasptarget_hand")][:3, 3]
        np.testing.assert_allclose(ee, R @ ee_s + np.asarray(off), atol=1e-5)


def test_dual_spec_urdf_roundtrip():
    """Composed multi-robot specs survive URDF export -> generic parse with
    bit-identical FK for every frame (parser and composer agree on the
    world-rooted tree; motor order mapped by name)."""
    import os
    import tempfile

    import numpy as np

    from rmp_tpu.models.kinematics import fk_all
    from rmp_tpu.models.specs import (PANDA_SPEC, build_model, make_dual_spec,
                                      write_urdf)
    from rmp_tpu.models.urdf import parse_urdf
    spec = make_dual_spec(PANDA_SPEC)
    m1 = build_model(spec)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "dual.urdf")
        write_urdf(spec, path)
        m2 = parse_urdf(path)
    q = np.random.default_rng(0).uniform(-1, 1, m1.n_q).astype(np.float32)
    qmap = [m1.motor_names.index(n) for n in m2.motor_names]
    T1 = np.asarray(fk_all(m1, jnp.asarray(q)))
    T2 = np.asarray(fk_all(m2, jnp.asarray(q[qmap])))
    f1 = {m1.frame_names[i]: T1[i] for i in range(m1.n_frames)}
    f2 = {m2.frame_names[i]: T2[i] for i in range(m2.n_frames)}
    assert set(f1) == set(f2)
    for k in f1:
        np.testing.assert_array_equal(f1[k], f2[k])
