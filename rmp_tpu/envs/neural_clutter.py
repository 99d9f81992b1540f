"""Learned obstacle avoidance in the domain-randomized cluttered scene.

Beyond-reference scenario family (like neural_reach): the hand-designed
v2 ObstacleAvoidance leaf (reference rmp2.py:140-196) is replaced by
policies/neural.neural_obstacle — an MLP over per-pair (distance,
approach-rate) features, trained end-to-end through the differentiable
batched rollout on the SAME randomization spaces the production sweep uses
(sim/randomizer.py). Everything else (attractor stack, goal/stuck
resampling, velocity limits) is the production franka/randomized_cluttered
configuration, so the learned leaf is evaluated under identical conditions
as the hand-designed yardstick (reports/eval_randomized.json).

Training recipe for the committed asset (assets/neural_clutter_franka.npz):
    python experiments/train_neural_clutter.py --seed 0 --batch 1024 \
        --ticks 100 --steps 400 --lr 1e-3 --w-collision 30 --barrier \
        --save assets/neural_clutter_franka.npz   # TPU, ~30 min
"""
from __future__ import annotations

import dataclasses
import os

import numpy as np

_ASSET = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                      os.pardir, "assets", "neural_clutter_franka.npz")


def clearance_aux(model, sim):
    """aux_fn: full per-pair obstacle distance matrix (L, K) each tick —
    the collision-shaping term of the training loss reads this."""
    from rmp_tpu.models import kinematics as K
    from rmp_tpu.sim.collision import robot_obstacle_distances

    T_all = K.fk_all(model, sim.q)
    _, _, _, d = robot_obstacle_distances(model, T_all, sim.obstacles)
    return {"obst_d": d}


def make_neural_clutter_env(key=None, net: dict | None = None,
                            hidden=(32, 32), train: bool = False,
                            barrier: bool = False):
    """franka/randomized_cluttered with the obstacle leaf swapped for the
    learned one (same grouped distance taskmap + ctx mask protocol).

    train=True: resampling/stuck hooks off (clean first-goal BPTT episodes)
    and aux carries the per-pair distance matrix for the collision loss.
    net=None initializes fresh from `key` (training).
    barrier=True: the structural near-contact authority variant (repulsion
    boost + 1/x metric exploder, policies/neural.py). The COMMITTED asset
    is this variant (92.1% success / 1.5% penetration); the unconstrained
    head trades the other way (96.6% / 9.6%) — a bounded head cannot learn
    an unbounded barrier (DESIGN.md round-3 notes).
    """
    import jax

    from rmp_tpu.envs import franka
    from rmp_tpu.policies import neural

    base = franka.env_randomized_cluttered()
    hand = base.policies[-1]          # grouped hand-designed obstacle leaf
    assert hand.name == "collision_avoidance"
    if net is None:
        net = neural.mlp_init(
            key if key is not None else jax.random.PRNGKey(0),
            (neural.OBSTACLE_FEATURES, *hidden, 2))
    kw = (dict(repulsion_boost=40.0, metric_exploder_std_dev=0.02)
          if barrier else {})
    pol = neural.neural_obstacle(taskmap=hand.taskmap, net=net,
                                 name="neural_obstacle", **kw)
    pol.ctx_key = hand.ctx_key
    env = dataclasses.replace(base, name="franka/neural_clutter",
                              policies=base.policies[:-1] + (pol,))
    if train:
        env = dataclasses.replace(env, on_solved=None, stuck_fn=None,
                                  aux_fn=clearance_aux)
    return env


def load_trained_net(path: str = _ASSET) -> dict:
    import jax.numpy as jnp

    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{path} missing — produce it with "
            f"python experiments/train_neural_clutter.py --save {path}")
    with np.load(path) as data:
        return {k: jnp.asarray(data[k]) for k in data.files}


def env_neural_clutter():
    """Registered scenario: TRAINED obstacle leaf (barrier variant),
    production randomized cluttered configuration (resampling + stuck
    detection on). Committed asset: 92.1% success / 1.5% final
    penetration on 4096 envs x 300 ticks (hand-designed leaf: 92.9% /
    1.0%; reports/eval_neural_clutter.json).

    RMP_NEURAL_CLUTTER_ASSET overrides the weights file (and
    RMP_NEURAL_CLUTTER_BARRIER=0 the head variant), so retrained
    candidates — either parametrization — evaluate through the standard
    sweep CLI (experiments/evaluate.py --env franka/neural_clutter)
    before being committed as the asset."""
    path = os.environ.get("RMP_NEURAL_CLUTTER_ASSET", _ASSET)
    barrier = os.environ.get("RMP_NEURAL_CLUTTER_BARRIER", "1") == "1"
    return make_neural_clutter_env(net=load_trained_net(path),
                                   barrier=barrier)
