"""Learned-policy scenario: an MLP RMP attractor on the two-joint robot.

Beyond-reference scenario family. The reference's experiments all run
hand-designed closed-form policies (experiments/two_joint_robot/01-05,
experiments/franka_panda/01-06); this scenario's attractor is a neural
network trained end-to-end through the differentiable rollout
(experiments/train_neural_rmp.py), something the reference's PyBullet C++
physics cannot support. The committed weights asset
assets/neural_reach_two_joint.npz is the training run's best-loss iterate;
re-train/re-produce it with
    python experiments/train_neural_rmp.py --cpu \
        --save assets/neural_reach_two_joint.npz
"""
from __future__ import annotations

import os

import numpy as np

GOAL_LOW = (0.1, -1.4, 0.1)
GOAL_HIGH = (1.4, 0.1, 0.1)
_ASSET = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                      os.pardir, "assets", "neural_reach_two_joint.npz")


def make_neural_env(key=None, net: dict | None = None, hidden=(32, 32)):
    """two_joint reaching env with a neural attractor + joint damping and a
    uniformly random goal per reset (the training task distribution).

    net: trained MLP weights; None initializes fresh from `key` (training).
    """
    import jax
    import jax.numpy as jnp

    from rmp_tpu import taskmaps as tm
    from rmp_tpu.envs.base import Env, bind_goal, env_state
    from rmp_tpu.models import robots
    from rmp_tpu.policies import neural, v2
    from rmp_tpu.sim.world import init_state

    model = robots.two_joint_robot()
    taskmap = tm.chain(tm.fk_frame(model, "link_23"), tm.to_position())
    if net is None:
        net = neural.mlp_init(key if key is not None else jax.random.PRNGKey(0),
                              (6, *hidden, neural.head_sizes(3)))
    policies = (
        neural.neural_attractor(goal=[0.0, 0.0, 0.0], taskmap=taskmap,
                                net=net, name="neural_target",
                                feat_scale=[2.0, 2.0, 2.0, 5.0, 5.0, 5.0]),
        v2.joint_damping(accel_d_gain=0.2, metric_scalar=0.2, inertia=0.1),
    )
    lo = jnp.asarray(GOAL_LOW, jnp.float32)
    hi = jnp.asarray(GOAL_HIGH, jnp.float32)

    def reset(k):
        kg, ks = jax.random.split(k)
        goal = jax.random.uniform(kg, (3,), minval=lo, maxval=hi)
        sim = init_state(model, q=robots.TWO_JOINT_Q_READY, goal=goal)
        return env_state(sim, ks)

    return Env(name="two_joint/neural_reach", model=model, policies=policies,
               reset=reset, ee_frame=model.frame_index("link_23"),
               solved_xy_only=True, resolve_method="cholesky",
               bind_params=bind_goal(("neural_target",)))


def load_trained_net() -> dict:
    """The committed trained weights (jnp arrays keyed 'w0','b0',...)."""
    import jax.numpy as jnp

    if not os.path.exists(_ASSET):
        raise FileNotFoundError(
            f"{_ASSET} missing — produce it with "
            "python experiments/train_neural_rmp.py --cpu "
            "--save assets/neural_reach_two_joint.npz")
    with np.load(_ASSET) as data:
        return {k: jnp.asarray(data[k]) for k in data.files}


def env_neural_reach():
    """Registered scenario: the TRAINED attractor on random reach goals."""
    return make_neural_env(net=load_trained_net())
