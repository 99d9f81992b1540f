"""Learned-policy scenario: an MLP RMP attractor on the two-joint robot.

Beyond-reference scenario family. The reference's experiments all run
hand-designed closed-form policies (experiments/two_joint_robot/01-05,
experiments/franka_panda/01-06); this scenario's attractor is a neural
network trained end-to-end through the differentiable rollout
(experiments/train_neural_rmp.py), something the reference's PyBullet C++
physics cannot support. The committed weights assets
assets/neural_reach_two_joint.npz / neural_reach_franka.npz are each
training run's best-loss iterate; reproduce them with the budgets that
produced them (the landscape is seed-sensitive — see the trainer's
docstring; seed 0 plateaus):
    python experiments/train_neural_rmp.py --cpu --seed 1 --batch 256 \
        --ticks 80 --steps 250 --lr 2e-3 \
        --save assets/neural_reach_two_joint.npz
    python experiments/train_neural_rmp.py --robot franka --seed 1 \
        --batch 1024 --ticks 80 --steps 500 --lr 2e-3 --hidden 64 64 \
        --save assets/neural_reach_franka.npz   # TPU, ~3 min
"""
from __future__ import annotations

import os

import numpy as np

GOAL_LOW = (0.1, -1.4, 0.1)
GOAL_HIGH = (1.4, 0.1, 0.1)
_ASSETS = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                       os.pardir, "assets")
_ASSET = os.path.join(_ASSETS, "neural_reach_two_joint.npz")
_ASSET_FRANKA = os.path.join(_ASSETS, "neural_reach_franka.npz")


def make_neural_env(key=None, net: dict | None = None, hidden=(32, 32),
                    robot: str = "two_joint"):
    """Reaching env with a neural attractor + joint damping and a random
    goal per reset (the training task distribution).

    robot: 'two_joint' (uniform goal box, planar solve check) or 'franka'
    (the reference's cylindrical goal distribution, sim/randomizer.py).
    net: trained MLP weights; None initializes fresh from `key` (training).
    """
    import jax
    import jax.numpy as jnp

    from rmp_tpu import taskmaps as tm
    from rmp_tpu.envs.base import Env, bind_goal, env_state
    from rmp_tpu.models import robots
    from rmp_tpu.policies import neural, v2
    from rmp_tpu.sim.world import init_state

    if robot == "two_joint":
        model = robots.two_joint_robot()
        ee, q0 = "link_23", robots.TWO_JOINT_Q_READY
        # workspace-scale feature normalization (keeps the tanh stack in
        # its linear range; see policies/neural.py)
        feat_scale = [2.0, 2.0, 2.0, 5.0, 5.0, 5.0]
        xy_only = True
        lo = jnp.asarray(GOAL_LOW, jnp.float32)
        hi = jnp.asarray(GOAL_HIGH, jnp.float32)

        def sample_goal(kg):
            return jax.random.uniform(kg, (3,), minval=lo, maxval=hi)
    elif robot == "franka":
        from rmp_tpu.sim.randomizer import randomize_goal
        model = robots.franka_panda()
        ee, q0 = "panda_grasptarget_hand", robots.PANDA_Q_READY
        feat_scale = [1.0, 1.0, 1.0, 2.0, 2.0, 2.0]
        xy_only = False
        sample_goal = randomize_goal       # reference cylindrical bounds
    else:
        raise ValueError(f"unknown robot {robot!r}")

    taskmap = tm.chain(tm.fk_frame(model, ee), tm.to_position())
    if net is None:
        net = neural.mlp_init(key if key is not None else jax.random.PRNGKey(0),
                              (6, *hidden, neural.head_sizes(3)))
    policies = (
        neural.neural_attractor(goal=[0.0, 0.0, 0.0], taskmap=taskmap,
                                net=net, name="neural_target",
                                feat_scale=feat_scale),
        v2.joint_damping(accel_d_gain=0.2, metric_scalar=0.2, inertia=0.1),
    )

    def reset(k):
        kg, ks = jax.random.split(k)
        sim = init_state(model, q=q0, goal=sample_goal(kg))
        return env_state(sim, ks)

    return Env(name=f"{robot}/neural_reach", model=model, policies=policies,
               reset=reset, ee_frame=model.frame_index(ee),
               solved_xy_only=xy_only, resolve_method="cholesky",
               # divergence backstop behind the tanh accel bound: an
               # untrained/mid-training net must not propagate NaN or
               # exploding commands into sim state (policies/neural.py)
               max_qdd=100.0,
               bind_params=bind_goal(("neural_target",)))


def load_trained_net(path: str = _ASSET) -> dict:
    """Committed trained weights (jnp arrays keyed 'w0','b0',...)."""
    import jax.numpy as jnp

    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{path} missing — produce it with "
            f"python experiments/train_neural_rmp.py --save {path}")
    with np.load(path) as data:
        return {k: jnp.asarray(data[k]) for k in data.files}


def env_neural_reach():
    """Registered scenario: the TRAINED attractor on random reach goals."""
    return make_neural_env(net=load_trained_net())


def env_neural_reach_franka():
    """Registered scenario: the TRAINED Franka attractor (9-DoF flagship
    robot; weights trained ON the TPU, see train_neural_rmp.py --robot
    franka)."""
    return make_neural_env(net=load_trained_net(_ASSET_FRANKA),
                           robot="franka")
