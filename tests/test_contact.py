"""Contact dynamics tests: ground support, obstacle blocking.

(Capability beyond the reference's contact-free RMP envelope — PyBullet
handled contact there; see sim/contact.py.)
"""
import jax
import jax.numpy as jnp
import numpy as np

from rmp_tpu.models import kinematics as K
from rmp_tpu.models import robots
from rmp_tpu.sim import world
from rmp_tpu.sim.collision import link_world_capsules, sphere_obstacle
from rmp_tpu.sim.contact import ContactParams, contact_torques
import pytest


def _min_ground_clearance(model, q):
    T_all = K.fk_all(model, jnp.asarray(q))
    p0, p1, radius = link_world_capsules(model, T_all)
    lows = jnp.minimum(p0[:, 2], p1[:, 2]) - radius
    return float(jnp.min(lows))


@pytest.mark.slow
def test_panda_falls_without_contact_rests_with_contact():
    """Zero torque command under gravity: without contact the arm collapses
    through the floor; with ground contact it comes to rest near/above it."""
    model = robots.franka_panda()
    zero = jnp.zeros(model.n_q)

    def drop(contact):
        state = world.init_state(model, q=robots.PANDA_Q_READY)
        # tau = 0: command the gravity-collapse acceleration explicitly via
        # torque mode with qdd_des = FD(q, qd, 0) each step
        step = jax.jit(lambda s: world.physics_step(
            model, s,
            __import__("rmp_tpu.sim.dynamics", fromlist=["d"]).forward_dynamics(
                model, s.q, s.qd, jnp.zeros(model.n_q)),
            dt=0.005, contact=contact))
        for _ in range(400):
            state = step(state)
        return state

    no_contact = drop(False)
    with_contact = drop(True)
    clearance_contact = _min_ground_clearance(model, with_contact.q)
    # with contact the arm is supported within the penalty compliance...
    assert clearance_contact > -0.05, f"sank through floor: {clearance_contact}"
    assert np.all(np.isfinite(np.asarray(with_contact.q)))
    # ...and dissipates energy: much slower than the freely swinging arm
    v_contact = float(jnp.linalg.norm(with_contact.qd))
    v_free = float(jnp.linalg.norm(no_contact.qd))
    assert v_contact < 0.5 * v_free, (v_contact, v_free)


def test_contact_torques_push_out_of_obstacle():
    """A sphere penetrating a link produces torques that move the closest
    point away from the obstacle center."""
    model = robots.two_joint_robot()
    q = jnp.asarray([0.0, 0.0], jnp.float32)
    qd = jnp.zeros(2)
    # sphere overlapping link_1 capsule (capsule at z=0.075..0.125, r=0.05)
    obs = sphere_obstacle([0.5, 0.04, 0.075], 0.05)   # inside the capsule skin
    tau = contact_torques(model, q, qd, obs,
                          ContactParams(ground=False))
    tau = np.asarray(tau)
    assert np.any(np.abs(tau) > 1e-3), "no contact torque generated"
    # torque should rotate joint 1 negative (link pushed to -y)
    assert tau[0] < 0


def test_no_contact_no_torque():
    model = robots.two_joint_robot()
    q = jnp.asarray([0.3, -0.2], jnp.float32)
    obs = sphere_obstacle([5.0, 5.0, 5.0], 0.05)
    tau = np.asarray(contact_torques(model, q, jnp.zeros(2), obs,
                                     ContactParams(ground=False)))
    np.testing.assert_allclose(tau, np.zeros(2), atol=1e-6)


@pytest.mark.slow
def test_provoke_collision_env_is_blocked_by_contact():
    """franka/02: without obstacle RMPs the arm drives into the cylinder;
    contact forces must noticeably impede it vs the contact-free ghost."""
    from rmp_tpu import envs
    from rmp_tpu.envs.base import make_control_step
    from rmp_tpu.sim.collision import robot_obstacle_distances

    def run(contact):
        env = envs.franka.env_02_provoke_collision(contact=contact)
        state = env.reset(jax.random.PRNGKey(0))
        step = jax.jit(make_control_step(env))
        min_d = np.inf
        for _ in range(120):
            state, _ = step(state, env.gather_params())
            T_all = K.fk_all(env.model, state.sim.q)
            _, _, _, d = robot_obstacle_distances(env.model, T_all,
                                                  state.sim.obstacles)
            min_d = min(min_d, float(jnp.min(d)))
        return min_d, state

    d_ghost, _ = run(False)
    d_contact, s_contact = run(True)
    # the commanded path grazes the thin cylinder: the ghost penetrates,
    # the contact run penetrates less (pushed out by the penalty forces)
    assert d_ghost < -0.004, f"ghost path should penetrate, got {d_ghost}"
    assert d_contact > d_ghost + 0.002, (d_contact, d_ghost)
    assert np.isfinite(np.asarray(s_contact.sim.q)).all()


@pytest.mark.slow
def test_impulse_contacts_rest_on_ground():
    """Hard contacts: the collapsing arm comes to rest ON the floor (tiny
    penetration, tiny residual velocity) vs the penalty model's compliance."""
    from rmp_tpu.sim import dynamics, world
    from rmp_tpu.sim.contact import impulse_contact_velocity

    model = robots.franka_panda()
    dt = 0.005
    state = world.init_state(model, q=robots.PANDA_Q_READY)

    @jax.jit
    def step(s):
        qdd = dynamics.forward_dynamics(model, s.q, s.qd,
                                        jnp.zeros(model.n_q))
        qd_new = s.qd + qdd * dt
        qd_new = impulse_contact_velocity(model, s.q, qd_new, dt,
                                          obstacles=None, ground=True)
        # limit-aware position integration (zeroes outward velocity at stops)
        q_new, qd_new = dynamics.semi_implicit_euler_step(
            model, s.q, qd_new, jnp.zeros(model.n_q), dt)
        import dataclasses
        return dataclasses.replace(s, q=q_new, qd=qd_new)

    worst = np.inf
    for i in range(500):
        state = step(state)
        if i >= 100:   # after the initial collapse
            worst = min(worst, _min_ground_clearance(model, state.q))
    assert np.isfinite(np.asarray(state.q)).all()
    # hard contacts keep worst-case transient penetration ~mm-scale
    # (steady-state ~0.3 mm), vs the penalty model's ~2-3 cm compliance
    assert worst > -0.01, f"hard contact penetrated: {worst}"


@pytest.mark.slow
def test_physics_step_impulse_model():
    """physics_step(contact_model='impulse') supports the collapsing arm."""
    from rmp_tpu.sim import world

    model = robots.franka_panda()
    state = world.init_state(model, q=robots.PANDA_Q_READY)
    step = jax.jit(lambda s: world.physics_step(
        model, s, jnp.zeros(model.n_q), dt=0.005, torque_mode=True,
        contact=True, contact_model="impulse"))
    for _ in range(400):
        state = step(state)
    assert np.isfinite(np.asarray(state.q)).all()
    assert _min_ground_clearance(model, state.q) > -0.01
