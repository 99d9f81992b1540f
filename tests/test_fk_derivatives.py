"""Analytic FK derivatives vs the autodiff path (which is itself
parity-tested against the reference implementation)."""
import jax
import jax.numpy as jnp
import numpy as np

from rmp_tpu.models import kinematics as K
from rmp_tpu.models import robots
from rmp_tpu.models.fk_derivatives import fk_derivatives
import pytest

rng = np.random.default_rng(8)


def _check_model(model, trials=3, atol=1e-4):
    fd = jax.jit(lambda q, qd: fk_derivatives(model, q, qd))
    for _ in range(trials):
        q = jnp.asarray(rng.uniform(-1.3, 1.3, model.n_q), jnp.float32)
        qd = jnp.asarray(rng.uniform(-1.0, 1.0, model.n_q), jnp.float32)
        T16, Td16, J16, c16 = jax.tree.map(np.asarray, fd(q, qd))
        for k in range(model.n_frames):
            x, xd, J, c = jax.tree.map(
                np.asarray, K.fk_differentiate(model, q, qd, k))
            np.testing.assert_allclose(T16[k], x, atol=atol,
                                       err_msg=f"T frame {k}")
            np.testing.assert_allclose(Td16[k], xd, atol=atol,
                                       err_msg=f"Td frame {k}")
            np.testing.assert_allclose(J16[k], J, atol=atol,
                                       err_msg=f"J frame {k}")
            np.testing.assert_allclose(c16[k], c, atol=5 * atol,
                                       err_msg=f"c frame {k}")


@pytest.mark.slow
def test_two_joint_analytic_derivatives():
    _check_model(robots.two_joint_robot())


@pytest.mark.slow
def test_panda_analytic_derivatives():
    _check_model(robots.franka_panda())


@pytest.mark.slow
def test_vmap_and_jit():
    model = robots.franka_panda()
    B = 16
    qs = jnp.asarray(rng.uniform(-1, 1, (B, model.n_q)), jnp.float32)
    qds = jnp.asarray(rng.uniform(-1, 1, (B, model.n_q)), jnp.float32)
    fd = jax.jit(jax.vmap(lambda q, qd: fk_derivatives(model, q, qd)))
    T16, Td16, J16, c16 = fd(qs, qds)
    assert T16.shape == (B, model.n_frames, 16)
    assert J16.shape == (B, model.n_frames, 16, model.n_q)
    for out in (T16, Td16, J16, c16):
        assert np.all(np.isfinite(np.asarray(out)))
