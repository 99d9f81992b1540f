"""Simulation world: functional core + reference-style stateful wrapper.

Capability parity with the reference Simulation class (simulation.py:274-491)
re-designed TPU-first:
  * world state is a SimState pytree (q, q̇, t, obstacles, goal) — batched
    via vmap, sharded via shard_map, checkpointable as a pytree;
  * `physics_step` is the jitted equivalent of the reference's
    calculateInverseDynamics -> TORQUE_CONTROL -> stepSimulation sequence
    (simulation.py:369-386);
  * `sense` is the equivalent of Simulation.state() + Datamanager.update
    (simulation.py:388-409, data_management.py:22-37);
  * the Simulation class below gives the reference's imperative surface
    (connect / populate_scene / step / state / reset) for interactive use.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rmp_tpu.models import kinematics as K
from rmp_tpu.models.urdf import KinematicModel
from rmp_tpu.sim import dynamics
from rmp_tpu.sim.collision import ObstacleSet
from rmp_tpu.sim.data import distance_context
from rmp_tpu.sim.objects import Goal, Robot, SceneObject

Array = jax.Array


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SimState:
    """World state pytree. `goal` is a (3,) position (or None)."""

    q: Array
    qd: Array
    t: Array
    obstacles: ObstacleSet | None = None
    goal: Array | None = None

    def tree_flatten(self):
        return (self.q, self.qd, self.t, self.obstacles, self.goal), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        del aux
        return cls(*children)


def init_state(model: KinematicModel, q=None, qd=None,
               obstacles: ObstacleSet | None = None,
               goal=None) -> SimState:
    n = model.n_q
    return SimState(
        q=jnp.zeros(n, jnp.float32) if q is None else jnp.asarray(q, jnp.float32),
        qd=jnp.zeros(n, jnp.float32) if qd is None else jnp.asarray(qd, jnp.float32),
        t=jnp.zeros((), jnp.float32),
        obstacles=obstacles,
        goal=None if goal is None else jnp.asarray(goal, jnp.float32),
    )


def physics_step(model: KinematicModel, state: SimState, qdd_desired: Array,
                 dt: float, torque_mode: bool = False,
                 enforce_limits: bool = True,
                 enforce_velocity_limits: bool = False,
                 contact: bool = False, contact_params=None,
                 contact_model: str = "penalty") -> SimState:
    """One physics step at Δt.

    torque_mode=False (default): the commanded acceleration is realized
    exactly — mathematically identical to the reference's loop, where
    inverse-dynamics torques are recomputed from the *current* (q, q̇) every
    physics tick and applied through an exact forward model
    (simulation.py:369-381; ID and FD cancel in contact-free motion).
    torque_mode=True: explicitly routes through tau = ID(q, q̇, q̈_des) and
    q̈ = FD(q, q̇, tau) — the torque-level path, for consumers that inject
    disturbances or clamp efforts.
    """
    qdd = qdd_desired
    if torque_mode or contact:
        tau = dynamics.inverse_dynamics(model, state.q, state.qd, qdd_desired)
        tau = jnp.clip(tau, -jnp.asarray(model.effort_limit),
                       jnp.asarray(model.effort_limit))
        if contact and contact_model == "penalty":
            from rmp_tpu.sim.contact import ContactParams, contact_torques
            tau = tau + contact_torques(
                model, state.q, state.qd, state.obstacles,
                contact_params or ContactParams())
        qdd = dynamics.forward_dynamics(model, state.q, state.qd, tau)
    q, qd = dynamics.semi_implicit_euler_step(model, state.q, state.qd, qdd,
                                              dt, enforce_limits,
                                              enforce_velocity_limits)
    if contact and contact_model == "impulse":
        # hard contacts: velocity-level impulse resolution post-integration
        from rmp_tpu.sim.contact import impulse_contact_velocity
        qd = impulse_contact_velocity(model, state.q, qd, dt,
                                      obstacles=state.obstacles)
        q = state.q + qd * dt
        if enforce_limits:
            low = jnp.asarray(model.q_lower)
            high = jnp.asarray(model.q_upper)
            below, above = q < low, q > high
            q = jnp.clip(q, low, high)
            qd = jnp.where(below & (qd < 0), 0.0, qd)
            qd = jnp.where(above & (qd > 0), 0.0, qd)
    return dataclasses.replace(state, q=q, qd=qd, t=state.t + dt)


def sense(model: KinematicModel, state: SimState, T_all: Array | None = None,
          geometry: str = "capsule"):
    """(q, q̇, distance context) — reference Simulation.state().

    T_all: optional precomputed world transforms (F, 4, 4) at state.q; pass
    them when the caller already ran FK this tick (core.fk_bundle) so the
    distance context doesn't pay a second fk_all.
    geometry: 'capsule' or 'hull' (exact mesh-hull GJK; sim/collision.py)."""
    ctx = {}
    if state.obstacles is not None and state.obstacles.count > 0:
        if T_all is None:
            T_all = K.fk_all(model, state.q)
        ctx = distance_context(model, T_all, state.obstacles, geometry)
    return state.q, state.qd, ctx


def scene_to_obstacles(objects: list[SceneObject]) -> ObstacleSet | None:
    sets = [o.as_obstacle() for o in objects]
    sets = [s for s in sets if s is not None]
    return ObstacleSet.of(*sets) if sets else None


class Simulation:
    """Imperative wrapper with the reference Simulation surface.

    connect()/disconnect() are retained as no-ops for drop-in familiarity
    (there is no physics server process — the engine is jit-compiled XLA).
    """

    def __init__(self, delta_t: float = 0.01, animation_save_path=None,
                 torque_mode: bool = False):
        self._delta_t = delta_t
        self.t = 0.0
        self.robot: Robot | None = None
        self.goal: Goal | None = None
        self.obstacles: list[SceneObject] = []
        self.animation_save_path = animation_save_path
        self._frames = []
        self._fps_animation = 16
        self._t_prev_animation = 0.0
        self._torque_mode = torque_mode
        self._state: SimState | None = None
        self._model: KinematicModel | None = None
        self._step_fn = None

    # -- lifecycle ------------------------------------------------------------

    def connect(self):
        return self

    def disconnect(self):
        self.clear_scene()

    @property
    def delta_t(self) -> float:
        return self._delta_t

    @property
    def n_obstacles(self) -> int:
        return len(self.obstacles)

    def populate_scene(self, objects):
        if not isinstance(objects, list):
            objects = [objects]
        for obj in objects:
            if isinstance(obj, Robot):
                self.robot = obj
                self._model = obj.model
            elif isinstance(obj, Goal):
                self.goal = obj
            else:
                self.obstacles.append(obj)
        self._rebuild_state()

    def clear_scene(self):
        self.obstacles = []
        self.robot = None
        self.goal = None
        self._state = None
        self._step_fn = None

    def reset(self):
        self.t = 0.0
        self._rebuild_state()

    def _rebuild_state(self):
        if self.robot is None:
            return
        self._state = init_state(
            self._model, q=self.robot.q, qd=self.robot.qd,
            obstacles=scene_to_obstacles(self.obstacles),
            goal=None if self.goal is None else self.goal.base_position)
        if self._step_fn is None:
            model, dt, tm = self._model, self._delta_t, self._torque_mode
            self._step_fn = jax.jit(
                lambda s, a: physics_step(model, s, a, dt, torque_mode=tm))

    # -- state access (reference surface) --------------------------------------

    @property
    def q(self) -> np.ndarray:
        return np.asarray(self._state.q)

    @q.setter
    def q(self, value):
        self._state = dataclasses.replace(
            self._state, q=jnp.asarray(value, jnp.float32))

    @property
    def qd(self) -> np.ndarray:
        return np.asarray(self._state.qd)

    @qd.setter
    def qd(self, value):
        self._state = dataclasses.replace(
            self._state, qd=jnp.asarray(value, jnp.float32))

    def state(self):
        """(q, q̇, distance context dict) — reference simulation.py:388-391."""
        q, qd, ctx = sense(self._model, self._state)
        return np.asarray(q), np.asarray(qd), ctx

    def step(self, qdd_desired):
        """Advance one physics tick (reference simulation.py:369-386)."""
        self._state = self._step_fn(self._state,
                                    jnp.asarray(qdd_desired, jnp.float32))
        self.t += self._delta_t
        if (self.animation_save_path is not None
                and self.t > self._t_prev_animation + 1.0 / self._fps_animation):
            self._capture_frame()
            self._t_prev_animation = self.t

    # -- recording --------------------------------------------------------------

    def _capture_frame(self):
        from rmp_tpu.utils import native
        if native.available():
            self._frames.append(native.render_scene_native(
                self._model, self._state, goal=self.goal))
        else:
            from rmp_tpu.utils.render import render_scene
            self._frames.append(render_scene(self._model, self._state,
                                             objects=self.obstacles,
                                             goal=self.goal))

    def save_animation(self):
        if self.animation_save_path and self._frames:
            from rmp_tpu.utils.render import save_gif
            save_gif(self._frames, self.animation_save_path,
                     fps=self._fps_animation)
