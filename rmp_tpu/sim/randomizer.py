"""Domain randomization of scenes.

Capability parity with reference SceneRandomizer (simulation.py:494-548 and
its near-duplicate experiments/franka_panda/config/scene_randomization.py):
cylindrical-coordinate obstacle sampling, robot q/q̇ jitter around the ready
pose, goal resampling — re-designed functional: every sampler takes a
jax.random key and returns arrays, so whole batches of randomized
environments are drawn with one vmapped call on-device.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rmp_tpu.models import robots
from rmp_tpu.ops import geom
from rmp_tpu.sim.collision import ObstacleSet

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class CylinderSampleSpace:
    """Reference default_sample_space (simulation.py:495-500)."""

    position_cylindrical_low: tuple = (0.4, 0.0, 0.0)     # (r, phi, z)
    position_cylindrical_high: tuple = (0.9, 2 * np.pi, 1.0)
    orientation_low: tuple = (0.0, 0.0, 0.0)
    orientation_high: tuple = (np.pi, np.pi, np.pi)
    radius_low: float = 0.05
    radius_high: float = 0.1
    height_low: float = 0.5
    height_high: float = 0.5


@dataclasses.dataclass(frozen=True)
class RobotSampleSpace:
    """Reference default_robot_sample_space (simulation.py:502-506)."""

    q_low: np.ndarray = None
    q_high: np.ndarray = None
    qd_low: np.ndarray = None
    qd_high: np.ndarray = None

    @staticmethod
    def panda_default() -> "RobotSampleSpace":
        qr = robots.PANDA_Q_READY
        return RobotSampleSpace(q_low=qr - 0.1, q_high=qr + 0.1,
                                qd_low=np.full_like(qr, -0.005),
                                qd_high=np.full_like(qr, 0.005))


# numpy, NOT jnp: module-scope device arrays initialize the XLA backend at
# import time (breaks jax.distributed.initialize / post-import config)
GOAL_CYL_LOW = np.asarray([0.4, 0.0, 0.0], dtype=np.float32)
GOAL_CYL_HIGH = np.asarray([0.9, 2 * np.pi, 1.0], dtype=np.float32)


def _cylindrical_to_cartesian(rpz: Array) -> Array:
    r, phi, z = rpz[..., 0], rpz[..., 1], rpz[..., 2]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def randomize_obstacles(key: Array, n_obstacles: int,
                        space: CylinderSampleSpace | None = None) -> ObstacleSet:
    """Sample n_obstacles cylinders (as capsules) — one env; vmap for batches."""
    space = space or CylinderSampleSpace()
    k1, k2, k3, k4 = jax.random.split(key, 4)
    rpz = jax.random.uniform(
        k1, (n_obstacles, 3),
        minval=jnp.asarray(space.position_cylindrical_low),
        maxval=jnp.asarray(space.position_cylindrical_high))
    center = _cylindrical_to_cartesian(rpz)
    rpy = jax.random.uniform(
        k2, (n_obstacles, 3), minval=jnp.asarray(space.orientation_low),
        maxval=jnp.asarray(space.orientation_high))
    radius = jax.random.uniform(k3, (n_obstacles,), minval=space.radius_low,
                                maxval=space.radius_high)
    height = jax.random.uniform(k4, (n_obstacles,), minval=space.height_low,
                                maxval=space.height_high)
    axis_dir = geom.rotation_matrix_from_rpy(rpy)[..., :, 2]
    half = (height / 2.0)[..., None] * axis_dir
    return ObstacleSet(p0=center - half, p1=center + half, radius=radius,
                       kinds=("cylinder",) * n_obstacles)


def randomize_robot_config(key: Array,
                           space: RobotSampleSpace | None = None):
    """(q, q̇) jittered around the ready pose."""
    space = space or RobotSampleSpace.panda_default()
    kq, kqd = jax.random.split(key)
    q = jax.random.uniform(kq, (len(space.q_low),),
                           minval=jnp.asarray(space.q_low),
                           maxval=jnp.asarray(space.q_high))
    qd = jax.random.uniform(kqd, (len(space.qd_low),),
                            minval=jnp.asarray(space.qd_low),
                            maxval=jnp.asarray(space.qd_high))
    return q, qd


def randomize_goal(key: Array, low: Array = GOAL_CYL_LOW,
                   high: Array = GOAL_CYL_HIGH,
                   obstacles: ObstacleSet | None = None,
                   clearance: float = 0.05, tries: int = 8) -> Array:
    """Goal position sampled in cylindrical coordinates
    (reference simulation.py:543-548).

    With `obstacles`, rejection-samples BRANCHLESSLY: draws `tries`
    candidates at once and keeps the first with at least `clearance` of
    free space around it, falling back to the most-clear candidate in the
    (~0.06^tries ~ 1e-10) event that none qualifies. The reference samples
    blindly, which leaves ~6% of goals unreachable inside obstacle
    clearance (measured, experiments/evaluate.py goal_feasible_rate).

    Without obstacles the single-draw RNG stream is preserved (same goals
    for the same key as before this feature existed)."""
    if obstacles is None or obstacles.count == 0:
        rpz = jax.random.uniform(key, (3,), minval=jnp.asarray(low),
                                 maxval=jnp.asarray(high))
        return _cylindrical_to_cartesian(rpz)
    rpz = jax.random.uniform(key, (tries, 3), minval=jnp.asarray(low),
                             maxval=jnp.asarray(high))
    cand = _cylindrical_to_cartesian(rpz)                 # (tries, 3)
    return _pick_clear_candidate(cand, obstacles, clearance)


def _pick_clear_candidate(cand: Array, obstacles: ObstacleSet,
                          clearance: float) -> Array:
    """Branchless rejection core: the first candidate point with at least
    `clearance` of free space around it, else the most-clear candidate."""
    tries = cand.shape[0]
    # min point-to-capsule distance per candidate
    from rmp_tpu.sim.collision import capsule_capsule_query
    _, _, _, d = capsule_capsule_query(
        cand[:, None], cand[:, None], jnp.zeros((tries, 1)),
        obstacles.p0[None], obstacles.p1[None], obstacles.radius[None])
    clear = jnp.min(d, axis=-1)                           # (tries,)
    ok = clear >= clearance
    # first qualifying candidate, else the most-clear one
    first = ok & (jnp.cumsum(ok.astype(jnp.int32)) <= 1)
    fallback = jnp.arange(tries) == jnp.argmax(clear)
    pick = jnp.where(jnp.any(ok), first, fallback)
    return jnp.sum(jnp.where(pick[:, None], cand, 0.0), axis=0)


def randomize_goal_box(key: Array, low, high,
                       obstacles: ObstacleSet | None = None,
                       clearance: float = 0.05, tries: int = 8) -> Array:
    """Goal sampled uniformly in a Cartesian box, rejection-sampled clear
    of obstacles exactly like randomize_goal.

    Multi-robot shared workspaces are box-shaped around no single base, so
    the single-robot cylindrical parameterization (reference
    simulation.py:543-548, centered on ITS robot's base) doesn't fit them."""
    low = jnp.asarray(low, jnp.float32)
    high = jnp.asarray(high, jnp.float32)
    if obstacles is None or obstacles.count == 0:
        return jax.random.uniform(key, (3,), minval=low, maxval=high)
    cand = jax.random.uniform(key, (tries, 3), minval=low, maxval=high)
    return _pick_clear_candidate(cand, obstacles, clearance)


def randomize_obstacles_box(key: Array, n_obstacles: int, low, high,
                            radius_low: float = 0.04,
                            radius_high: float = 0.08,
                            height: float = 0.5,
                            avoid=None, avoid_clearance: float = 0.03,
                            tries: int = 8) -> ObstacleSet:
    """Cylinder obstacles with centers uniform in a Cartesian box and
    uniformly random orientation — the box-workspace counterpart of
    randomize_obstacles (which samples cylindrically around one robot's
    base, reference simulation.py:495-500); one env, vmap for batches.

    `avoid`: optional (p0 (P,3), p1 (P,3), radius (P,)) world capsules —
    e.g. collision.link_world_capsules_all of the robot's INITIAL pose —
    that obstacles must spawn at least `avoid_clearance` away from. Each
    obstacle draws `tries` candidate centers and keeps the first clear one
    (else the most-clear), same branchless pattern as randomize_goal.
    The cylindrical sampler gets this for free (its radial band starts
    outside the ready pose); a free box sampler does not: without it, a
    workspace box overlapping the spawn pose starts a majority of envs in
    penetration (measured 67% on the dual-arm clutter scene)."""
    k1, k2, k3 = jax.random.split(key, 3)
    low = jnp.asarray(low, jnp.float32)
    high = jnp.asarray(high, jnp.float32)
    shape = ((n_obstacles, 3) if avoid is None
             else (n_obstacles, tries, 3))
    center = jax.random.uniform(k1, shape, minval=low, maxval=high)
    rpy = jax.random.uniform(k2, (n_obstacles, 3), minval=0.0,
                             maxval=float(np.pi))
    radius = jax.random.uniform(k3, (n_obstacles,), minval=radius_low,
                                maxval=radius_high)
    axis_dir = geom.rotation_matrix_from_rpy(rpy)[..., :, 2]
    half = (height / 2.0) * axis_dir                      # (n, 3)
    if avoid is not None:
        from rmp_tpu.sim.collision import capsule_capsule_query
        ap0, ap1, ar = avoid
        c0 = center - half[:, None, :]                    # (n, tries, 3)
        c1 = center + half[:, None, :]
        _, _, _, d = capsule_capsule_query(
            c0[:, :, None], c1[:, :, None], radius[:, None, None],
            ap0, ap1, ar)                                 # (n, tries, P)
        clear = jnp.min(d, axis=-1)                       # (n, tries)
        ok = clear >= avoid_clearance
        first = ok & (jnp.cumsum(ok.astype(jnp.int32), axis=1) <= 1)
        fallback = (jnp.arange(tries)[None]
                    == jnp.argmax(clear, axis=1)[:, None])
        pick = jnp.where(jnp.any(ok, axis=1, keepdims=True), first, fallback)
        center = jnp.sum(jnp.where(pick[..., None], center, 0.0), axis=1)
    return ObstacleSet(p0=center - half, p1=center + half, radius=radius,
                       kinds=("cylinder",) * n_obstacles)


class SceneRandomizer:
    """Object-style wrapper mirroring the reference class surface
    (randomize_obstacles / randomize_robot_config / randomize_goal)."""

    def __init__(self, seed: int = 0,
                 sample_space: CylinderSampleSpace | None = None,
                 robot_space: RobotSampleSpace | None = None):
        self._key = jax.random.PRNGKey(seed)
        self.sample_space = sample_space or CylinderSampleSpace()
        self.robot_space = robot_space or RobotSampleSpace.panda_default()

    def _next(self) -> Array:
        self._key, k = jax.random.split(self._key)
        return k

    def randomize_obstacles(self, n_obstacles: int) -> ObstacleSet:
        return randomize_obstacles(self._next(), n_obstacles, self.sample_space)

    def randomize_robot_config(self):
        return randomize_robot_config(self._next(), self.robot_space)

    def randomize_goal(self) -> Array:
        return randomize_goal(self._next())
