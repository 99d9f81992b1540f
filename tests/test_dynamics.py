"""Dynamics tests — Lagrangian autodiff oracle.

The mass matrix and bias forces from RNEA are validated against a fully
independent derivation: kinetic/potential energies computed from the (already
reference-verified) FK, differentiated with JAX:
    M(q)      = ∂²T/∂q̇²
    h(q, q̇)  = (∂²T/∂q̇∂q) q̇ − ∂T/∂q + ∂V/∂q
plus structural invariants (symmetry, PSD) and FD∘ID = identity.
"""
import jax
import jax.numpy as jnp
import numpy as np

from rmp_tpu.models import kinematics as K
from rmp_tpu.models import robots
from rmp_tpu.models.urdf import ROOT
from rmp_tpu.sim import dynamics
import pytest

rng = np.random.default_rng(4)


def _energies(model):
    """Kinetic + potential energy as functions of (q, qd), via FK autodiff."""
    mass = jnp.asarray(model.mass)
    com = jnp.asarray(model.com)
    inertia = jnp.asarray(model.inertia)

    def com_positions(q):
        T_all = K.fk_all(model, q)                     # (F, 4, 4)
        return jnp.einsum("fij,fj->fi", T_all[:, :3, :3], com) + T_all[:, :3, 3]

    def rotations(q):
        return K.fk_all(model, q)[:, :3, :3]

    def kinetic(q, qd):
        # linear part: 1/2 m v_com^2 with v_com = J_com qd
        _, v_com = jax.jvp(com_positions, (q,), (qd,))
        lin = 0.5 * jnp.sum(mass * jnp.sum(v_com * v_com, axis=-1))
        # angular part: omega from Rdot = [omega]x R -> [omega]x = Rdot R^T
        R, Rd = jax.jvp(rotations, (q,), (qd,))
        omega_skew = jnp.einsum("fij,fkj->fik", Rd, R)  # world frame
        wx = omega_skew[:, 2, 1]
        wy = omega_skew[:, 0, 2]
        wz = omega_skew[:, 1, 0]
        omega_world = jnp.stack([wx, wy, wz], axis=-1)
        # body-frame omega for body-frame inertia
        omega_body = jnp.einsum("fji,fj->fi", R, omega_world)
        ang = 0.5 * jnp.sum(jnp.einsum("fi,fij,fj->f", omega_body, inertia,
                                       omega_body))
        return lin + ang

    def potential(q):
        p = com_positions(q)
        return jnp.sum(mass * 9.81 * p[:, 2])

    return kinetic, potential


@pytest.mark.slow
def test_mass_matrix_vs_lagrangian():
    for model in (robots.two_joint_robot(), robots.franka_panda()):
        kinetic, _ = _energies(model)
        for _ in range(3):
            q = jnp.asarray(rng.uniform(-1.2, 1.2, model.n_q), jnp.float32)
            M_rnea = np.asarray(dynamics.mass_matrix(model, q))
            M_lagr = np.asarray(jax.hessian(kinetic, argnums=1)(
                q, jnp.zeros(model.n_q, jnp.float32)))
            np.testing.assert_allclose(M_rnea, M_lagr, atol=2e-4)
            # symmetric PSD
            np.testing.assert_allclose(M_rnea, M_rnea.T, atol=2e-4)
            assert np.all(np.linalg.eigvalsh(0.5 * (M_rnea + M_rnea.T)) > -1e-5)


@pytest.mark.slow
def test_bias_forces_vs_lagrangian():
    for model in (robots.two_joint_robot(), robots.franka_panda()):
        kinetic, potential = _energies(model)

        def bias_lagr(q, qd):
            # h = (d/dq (∂T/∂q̇)) q̇ − ∂T/∂q + ∂V/∂q  (model damping is zero
            # for both robots' URDFs; RNEA adds damping*qd on top)
            dT_dqd = jax.grad(kinetic, argnums=1)
            term1 = jax.jvp(lambda qq: dT_dqd(qq, qd), (q,), (qd,))[1]
            term2 = jax.grad(kinetic, argnums=0)(q, qd)
            term3 = jax.grad(potential)(q)
            return term1 - term2 + term3

        for _ in range(3):
            q = jnp.asarray(rng.uniform(-1.2, 1.2, model.n_q), jnp.float32)
            qd = jnp.asarray(rng.uniform(-1.0, 1.0, model.n_q), jnp.float32)
            h_rnea = np.asarray(dynamics.bias_forces(model, q, qd))
            damping = np.asarray(model.joint_damping) * np.asarray(qd)
            h_l = np.asarray(bias_lagr(q, qd)) + damping
            np.testing.assert_allclose(h_rnea, h_l, atol=5e-3)


def test_forward_inverse_consistency():
    """FD(q, q̇, ID(q, q̇, q̈)) == q̈ — the exact-tracking property the
    reference's control loop relies on (simulation.py:369-381)."""
    model = robots.franka_panda()
    q = jnp.asarray(rng.uniform(-1.0, 1.0, model.n_q), jnp.float32)
    qd = jnp.asarray(rng.uniform(-0.5, 0.5, model.n_q), jnp.float32)
    qdd = jnp.asarray(rng.uniform(-1.0, 1.0, model.n_q), jnp.float32)
    tau = dynamics.inverse_dynamics(model, q, qd, qdd)
    qdd_back = np.asarray(dynamics.forward_dynamics(model, q, qd, tau))
    np.testing.assert_allclose(qdd_back, np.asarray(qdd), atol=1e-2)


def test_gravity_torques_two_link_analytic():
    """Static gravity torques of the planar arm (gravity along -z; the arm
    moves in the x-y plane, so static torques are zero — then tilt gravity
    along -y to get the textbook formula with point masses at the joints
    (URDF coms are at the joint origins)."""
    model = robots.two_joint_robot()
    q = jnp.asarray([0.3, -0.7], jnp.float32)
    zero = jnp.zeros(2, jnp.float32)
    tau_z = np.asarray(dynamics.inverse_dynamics(model, q, zero, zero))
    np.testing.assert_allclose(tau_z, np.zeros(2), atol=1e-5)
    # gravity along -y: m2 hangs at distance l1 from joint 1 (com at joint 2),
    # link_23_cyl mass m3 at l1 + l2*dir(q1+q2)
    g = jnp.asarray([0.0, -9.81, 0.0])
    tau_y = np.asarray(dynamics.inverse_dynamics(model, q, zero, zero,
                                                 gravity=g))
    m2, m3 = 0.5, 0.2
    q1, q2 = 0.3, -0.7
    # torque about z at joint 1: sum m_i g x_i (x = horizontal moment arm)
    x2 = np.cos(q1)            # joint-2 origin
    x3 = np.cos(q1) + np.cos(q1 + q2)
    tau1 = 9.81 * (m2 * x2 + m3 * x3)
    tau2 = 9.81 * (m3 * np.cos(q1 + q2))
    np.testing.assert_allclose(tau_y, [tau1, tau2], rtol=1e-4)


def test_semi_implicit_euler_and_limits():
    model = robots.two_joint_robot()
    q = jnp.asarray([3.1, 0.0], jnp.float32)
    qd = jnp.asarray([5.0, 1.0], jnp.float32)
    qdd = jnp.asarray([30.0, 0.0], jnp.float32)
    q1, qd1 = dynamics.semi_implicit_euler_step(model, q, qd, qdd, dt=0.01)
    # joint 0 hits its 3.14 limit -> clamped, outward velocity zeroed
    assert float(q1[0]) <= 3.14 + 1e-6
    assert float(qd1[0]) == 0.0
    # joint 1 integrates normally: qd += qdd dt; q += qd_new dt
    np.testing.assert_allclose(float(qd1[1]), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(q1[1]), 0.01, atol=1e-6)


@pytest.mark.slow
def test_dynamics_vmaps():
    model = robots.franka_panda()
    qs = jnp.asarray(rng.uniform(-1, 1, (8, model.n_q)), jnp.float32)
    qds = jnp.asarray(rng.uniform(-1, 1, (8, model.n_q)), jnp.float32)
    h = jax.jit(jax.vmap(lambda q, qd: dynamics.bias_forces(model, q, qd)))(
        qs, qds)
    assert h.shape == (8, model.n_q)
    assert np.all(np.isfinite(np.asarray(h)))
    np.testing.assert_allclose(
        np.asarray(h)[2],
        np.asarray(dynamics.bias_forces(model, qs[2], qds[2])), atol=1e-4)


@pytest.mark.slow
def test_crba_matches_id_trick():
    """CRBA mass matrix == ID-trick mass matrix (independent algorithms)."""
    for model in (robots.two_joint_robot(), robots.franka_panda()):
        for _ in range(3):
            q = jnp.asarray(rng.uniform(-1.2, 1.2, model.n_q), jnp.float32)
            M_id = np.asarray(dynamics.mass_matrix(model, q))
            M_crba = np.asarray(dynamics.mass_matrix_crba(model, q))
            np.testing.assert_allclose(M_crba, M_id, atol=2e-4)


def test_energy_conservation_free_swing():
    """Gravity-free, damping-free torque-mode dynamics conserve kinetic
    energy to integrator order (semi-implicit Euler drift stays bounded)."""
    model = robots.two_joint_robot()
    q = jnp.asarray([0.4, -0.9], jnp.float32)
    qd = jnp.asarray([1.0, -0.5], jnp.float32)
    no_g = jnp.zeros(3, jnp.float32)

    def energy(q, qd):
        M = dynamics.mass_matrix(model, q)
        return 0.5 * qd @ M @ qd

    e0 = float(energy(q, qd))
    dt = 0.001

    @jax.jit
    def step(q, qd):
        qdd = dynamics.forward_dynamics(model, q, qd,
                                        jnp.zeros(2), gravity=no_g)
        return dynamics.semi_implicit_euler_step(model, q, qd, qdd, dt,
                                                 enforce_limits=False)

    for _ in range(2000):   # 2 seconds
        q, qd = step(q, qd)
    e1 = float(energy(q, qd))
    assert abs(e1 - e0) / e0 < 0.05, (e0, e1)


def test_pendulum_period_torque_mode():
    """Small-angle pendulum period under gravity matches the closed form.

    One revolute joint about the x-axis (link hangs along -z when q=0):
    T = 2*pi*sqrt(I_total / (m g l_com)).
    """
    from rmp_tpu.models.specs import (JointSpec, LinkSpec, RobotSpec,
                                      build_model)
    m, l = 0.7, 0.5
    # point mass: inertia ABOUT THE COM ~ 0 (the m*l^2 term about the hinge
    # comes from the com offset via the parallel-axis contribution in RNEA)
    izz = m * l * l
    spec = RobotSpec(
        name="pendulum",
        links=(LinkSpec("base"),
               LinkSpec("bob", m, (0, 0, -l), (1e-6, 1e-6, 1e-6, 0, 0, 0))),
        joints=(JointSpec("hinge", "revolute", "base", "bob",
                          xyz=(0, 0, 1.0), axis=(1, 0, 0),
                          lower=-3.14, upper=3.14, velocity=100,
                          effort=100),))
    model = build_model(spec)
    q = jnp.asarray([0.1], jnp.float32)   # small angle
    qd = jnp.zeros(1, jnp.float32)
    dt = 0.001

    @jax.jit
    def step(q, qd):
        qdd = dynamics.forward_dynamics(model, q, qd, jnp.zeros(1))
        return dynamics.semi_implicit_euler_step(model, q, qd, qdd, dt,
                                                 enforce_limits=False)

    # count a full period via two successive positive-going zero crossings
    crossings = []
    prev = float(q[0])
    for i in range(4000):
        q, qd = step(q, qd)
        cur = float(q[0])
        if prev < 0 <= cur:
            crossings.append(i * dt)
        prev = cur
    assert len(crossings) >= 2, "pendulum did not oscillate"
    period = crossings[1] - crossings[0]
    expected = 2 * np.pi * np.sqrt(izz / (m * 9.81 * l))
    np.testing.assert_allclose(period, expected, rtol=0.03)


def test_velocity_limit_clamp():
    """enforce_velocity_limits clamps q-dot to the model's URDF velocity
    limits; OFF (parity default) it doesn't."""
    import numpy as np

    from rmp_tpu.models import robots
    model = robots.franka_panda()
    q = jnp.zeros(model.n_q)
    qd = jnp.zeros(model.n_q)
    qdd = jnp.full((model.n_q,), 1e4)          # huge kick
    _, qd_free = dynamics.semi_implicit_euler_step(model, q, qd, qdd, 0.01)
    _, qd_clamped = dynamics.semi_implicit_euler_step(
        model, q, qd, qdd, 0.01, enforce_velocity_limits=True)
    vmax = np.asarray(model.velocity_limit)
    assert (np.asarray(qd_free) > vmax).any()
    assert (np.abs(np.asarray(qd_clamped)) <= vmax + 1e-6).all()


def test_pybullet_inertia_quirk():
    """models/urdf.pybullet_collision_inertia replicates what plain
    p.loadURDF simulated (inertia recomputed from the collision shape via
    Bullet's box-AABB calculateLocalInertia; URDF <inertia> ignored):
    diagonal tensors, box formula from hull AABB + 1 mm margin, mass/COM
    unchanged — and the torque-level observables shift while FD(ID(.)) = id
    still holds on the quirk model."""
    import numpy as np

    from rmp_tpu.models import robots
    from rmp_tpu.models.hulls import hulls_for
    from rmp_tpu.models.urdf import pybullet_collision_inertia
    from rmp_tpu.sim import dynamics

    model = robots.franka_panda()
    quirk = pybullet_collision_inertia(model)
    hv = np.asarray(hulls_for(model))
    for row, f in enumerate(model.collision_frames):
        I = np.asarray(quirk.inertia[f])
        assert np.allclose(I, np.diag(np.diag(I)))       # diagonalized
        ext = hv[row].max(0) - hv[row].min(0) + 2e-3
        x2, y2, z2 = ext * ext
        expect = float(model.mass[f]) / 12.0 * np.asarray(
            [y2 + z2, x2 + z2, x2 + y2])
        np.testing.assert_allclose(np.diag(I), expect, rtol=1e-5)
    np.testing.assert_allclose(quirk.mass, model.mass, atol=0)
    np.testing.assert_allclose(quirk.com, model.com, atol=0)
    # non-collision frames keep their URDF tensors
    for f in range(model.n_frames):
        if f not in model.collision_frames:
            np.testing.assert_allclose(quirk.inertia[f], model.inertia[f],
                                       atol=0)

    q = jnp.asarray(robots.PANDA_Q_READY)
    qd = 0.1 * jnp.ones_like(q)
    qdd = 0.5 * jnp.ones_like(q)
    tau_q = dynamics.inverse_dynamics(quirk, q, qd, qdd)
    tau_u = dynamics.inverse_dynamics(model, q, qd, qdd)
    # the quirk moves the torques measurably (placeholder 0.1 tensors vs
    # box-AABB values an order of magnitude smaller)...
    assert float(jnp.max(jnp.abs(tau_q - tau_u))) > 0.05
    # ...while the round trip stays exact on the quirk model
    np.testing.assert_allclose(
        np.asarray(dynamics.forward_dynamics(quirk, q, qd, tau_q)),
        np.asarray(qdd), atol=1e-4)
