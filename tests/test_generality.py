"""Framework generality: everything is parameterized by the KinematicModel
(N-link generated robots run through FK, derivatives, dynamics, policies,
core, and a goal-reaching rollout)."""
import jax
import jax.numpy as jnp
import numpy as np

from rmp_tpu import core as rmp_core
from rmp_tpu import taskmaps as tm
from rmp_tpu.models import kinematics as K
from rmp_tpu.models.fk_derivatives import fk_derivatives
from rmp_tpu.models.specs import build_model, make_planar_arm_spec
from rmp_tpu.policies import v1, v2
from rmp_tpu.sim import dynamics
from rmp_tpu.sim.world import init_state, physics_step
import pytest

rng = np.random.default_rng(21)


@pytest.mark.slow
def test_five_link_arm_full_stack():
    model = build_model(make_planar_arm_spec(5))
    assert model.n_q == 5 and model.n_frames == 6
    ee = model.frame_index("ee_joint")

    # FK sanity: stretched arm reaches n_links * link_length = 2.5 in x
    T = np.asarray(K.fk_frame(model, jnp.zeros(5), ee))
    np.testing.assert_allclose(T[:3, 3], [2.5, 0.0, 0.05], atol=1e-5)

    # analytic derivatives == autodiff on the generated model
    q = jnp.asarray(rng.uniform(-1, 1, 5), jnp.float32)
    qd = jnp.asarray(rng.uniform(-1, 1, 5), jnp.float32)
    T16, Td16, J16, c16 = fk_derivatives(model, q, qd)
    x, xd, J, c = K.fk_differentiate(model, q, qd, ee)
    np.testing.assert_allclose(np.asarray(J16[ee]), np.asarray(J), atol=1e-4)

    # dynamics: CRBA == ID-trick
    M1 = np.asarray(dynamics.mass_matrix(model, q))
    M2 = np.asarray(dynamics.mass_matrix_crba(model, q))
    np.testing.assert_allclose(M1, M2, atol=2e-4)

    # closed-loop: attractor + damping reaches a goal
    goal = jnp.asarray([1.2, 1.2, 0.05])
    core = rmp_core.RmpCore(method="cholesky")
    core.add_rmp(v1.target_policy(
        goal=goal, taskmap=tm.chain(tm.fk_frame(model, ee), tm.to_position()),
        alpha=0.3, beta=0.8, c=0.1, name="target"))
    core.add_rmp(v2.joint_damping(accel_d_gain=1, metric_scalar=0.01,
                                  inertia=0.2))
    state = init_state(model, q=jnp.full(5, 0.3), goal=goal)
    fn = jax.jit(core.make_evaluate())
    params = core.gather_params()
    step = jax.jit(lambda s, a: physics_step(model, s, a, 0.01))
    for t in range(700):
        if t % 10 == 0:
            qdd = fn(state.q, state.qd, params, (None, None))
        state = step(state, qdd)
    ee_pos = np.asarray(K.fk_frame(model, state.q, ee))[:3, 3]
    assert np.linalg.norm(ee_pos - np.asarray(goal)) < 0.05
