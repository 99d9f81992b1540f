"""End-to-end differentiability: gradients flow through full rollouts.

(Beyond-reference capability: the reference's PyBullet C++ physics blocks
autodiff; here jax.grad works through FK + policies + resolve + integrator.)
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from experiments.tune_gains import make_loss
from rmp_tpu import envs
import pytest


@pytest.mark.slow
def test_rollout_gradients_exist_and_descend():
    env = envs.make("franka/01_target_rmp_only")
    env.resolve_method = "cholesky"
    env.on_solved = None
    loss, theta, _ = make_loss(env, batch=4, n_ticks=20)
    vg = jax.jit(jax.value_and_grad(loss))
    v0, g = vg(theta)
    g_flat = np.asarray([g["log_p"], g["log_d"]])
    assert np.all(np.isfinite(g_flat))
    assert np.linalg.norm(g_flat) > 1e-6, "zero gradient through rollout"
    # one descent step reduces the loss
    theta2 = {k: theta[k] - 0.2 * g[k] for k in theta}
    v1, _ = vg(theta2)
    assert float(v1) < float(v0), (float(v0), float(v1))


@pytest.mark.slow
def test_hull_mode_rollout_gradients():
    """Gain gradients flow through EXACT-geometry (hull/GJK) rollouts:
    support_hull's envelope custom_jvp makes the whole hull distance
    context jvp/vjp-safe, so gain tuning is no longer capsule-only."""
    env = envs.make("two_joint/05_obstacle_avoidance")
    env.resolve_method = "cholesky"
    env.on_solved = None
    env.collision_geometry = "hull"
    loss, theta, _ = make_loss(env, batch=2, n_ticks=6)
    v, g = jax.value_and_grad(loss)(theta)
    g_flat = np.asarray([g["log_p"], g["log_d"]])
    assert np.isfinite(float(v))
    assert np.all(np.isfinite(g_flat))
    assert np.linalg.norm(g_flat) > 1e-6, "zero gradient through hull rollout"


def test_remat_rollout_same_values_and_grads():
    """jax.checkpoint'ed rollouts: identical forward values; gradients match
    the non-remat path (recomputation changes memory, not math)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    "experiments"))
    from tune_gains import make_loss

    from rmp_tpu import envs
    env = envs.make("two_joint/01_target_rmp_only")
    loss_a, init, _ = make_loss(env, batch=4, n_ticks=8)
    loss_b, _, _ = make_loss(env, batch=4, n_ticks=8, remat=True)
    va, ga = jax.value_and_grad(loss_a)(init)
    vb, gb = jax.value_and_grad(loss_b)(init)
    assert abs(float(va) - float(vb)) < 1e-6
    for k in ga:
        np.testing.assert_allclose(float(ga[k]), float(gb[k]), rtol=1e-4)
