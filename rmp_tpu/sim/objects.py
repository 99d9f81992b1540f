"""Scene objects: robots, spheres, goals, cylinders.

Capability parity with the reference's PyBulletObject hierarchy
(simulation.py:14-272) minus the PyBullet client plumbing: objects are plain
descriptions; the world state they induce lives in a SimState pytree
(sim/world.py). Orientation accepts euler (3,) or quaternion xyzw (4,) like
the reference's quaternion/euler properties (simulation.py:27-39).
"""
from __future__ import annotations

import dataclasses
import typing

import numpy as np

from rmp_tpu.models import robots as robot_models
from rmp_tpu.ops import geom
from rmp_tpu.sim.collision import ObstacleSet, cylinder_obstacle, sphere_obstacle


def _to_euler(orientation) -> np.ndarray:
    orientation = np.asarray(orientation, dtype=np.float32)
    if orientation.shape[-1] == 4:
        import jax.numpy as jnp
        R = geom.rotation_matrix_from_quaternion(jnp.asarray(orientation))
        return np.asarray(geom.euler_from_rotation_matrix(R))
    return orientation


@dataclasses.dataclass
class SceneObject:
    base_position: tuple = (0.0, 0.0, 0.0)
    base_orientation: tuple = (0.0, 0.0, 0.0, 1.0)

    @property
    def euler(self) -> np.ndarray:
        return _to_euler(np.asarray(self.base_orientation))

    def as_obstacle(self) -> ObstacleSet | None:
        return None


@dataclasses.dataclass
class Sphere(SceneObject):
    radius: float = 0.1

    def as_obstacle(self) -> ObstacleSet:
        return sphere_obstacle(self.base_position, self.radius)


@dataclasses.dataclass
class Goal(Sphere):
    """Visual goal marker — no collision shape (reference simulation.py:227-243)."""

    def as_obstacle(self) -> None:
        return None


@dataclasses.dataclass
class Cylinder(SceneObject):
    radius: float = 0.05
    height: float = 0.3

    def as_obstacle(self) -> ObstacleSet:
        return cylinder_obstacle(self.base_position, self.euler, self.radius,
                                 self.height)


@dataclasses.dataclass
class Robot(SceneObject):
    q: np.ndarray | None = None
    qd: np.ndarray | None = None

    # per-robot constants: ClassVar so subclass class-attribute assignments
    # actually take effect (dataclass fields would keep the base default)
    model_fn: typing.ClassVar = None
    q_ready: typing.ClassVar[np.ndarray] = None
    q_lim_low: typing.ClassVar[np.ndarray] = None
    q_lim_high: typing.ClassVar[np.ndarray] = None

    def __post_init__(self):
        if self.q is None:
            self.q = np.array(type(self).q_ready, dtype=np.float32)
        if self.qd is None:
            self.qd = np.zeros_like(self.q)
        assert self.q.ndim == 1, "robot q must be a joint vector"

    @property
    def model(self):
        return type(self).model_fn()


@dataclasses.dataclass
class TwoJointRobot(Robot):
    q_ready = robot_models.TWO_JOINT_Q_READY
    q_lim_low = robot_models.TWO_JOINT_Q_LIM_LOW
    q_lim_high = robot_models.TWO_JOINT_Q_LIM_HIGH
    model_fn = staticmethod(robot_models.two_joint_robot)


@dataclasses.dataclass
class FrankaPanda(Robot):
    q_ready = robot_models.PANDA_Q_READY
    q_lim_low = robot_models.PANDA_Q_LIM_LOW
    q_lim_high = robot_models.PANDA_Q_LIM_HIGH
    model_fn = staticmethod(robot_models.franka_panda)
