"""Robot model constructors + per-robot constants.

Capability parity with the reference's robot classes (simulation.py:83-197):
ready poses, joint limits, URDF-equivalent kinematic/dynamic structure. The
models are built from numeric spec tables (models/specs.py); use
`rmp_tpu.models.urdf.parse_urdf` to load arbitrary external URDFs, and
`rmp_tpu.models.specs.write_urdf` to export these robots as URDF files.
"""
from __future__ import annotations

import functools

import numpy as np

from rmp_tpu.models.specs import PANDA_SPEC, TWO_JOINT_SPEC, build_model
from rmp_tpu.models.urdf import KinematicModel

# ready pose / limits: reference simulation.py:84-86 (TwoJointRobot) and
# simulation.py:137-139 (FrankaPanda; limits there are in pybullet's 12-joint
# indexing — ours are motor-ordered 9-vectors, same values).
TWO_JOINT_Q_READY = np.array([0.0, 0.0], dtype=np.float32)
TWO_JOINT_Q_LIM_LOW = np.array([-np.pi, -np.pi], dtype=np.float32)
TWO_JOINT_Q_LIM_HIGH = np.array([np.pi, np.pi], dtype=np.float32)

PANDA_Q_READY = np.array(
    [0.0, -0.3, 0.0, -2.2, 0.0, 2.0, np.pi / 4, 0.02, 0.02], dtype=np.float32)
PANDA_Q_LIM_LOW = np.array(
    [-2.9671, -1.8326, -2.9671, -3.1416, -2.9671, -0.0873, -2.9671, 0.0, 0.0],
    dtype=np.float32)
PANDA_Q_LIM_HIGH = np.array(
    [2.9671, 1.8326, 2.9671, 0.0, 2.9671, 3.8223, 2.9671, 0.04, 0.04],
    dtype=np.float32)

TWO_JOINT_EE_FRAME = "link_23"
PANDA_EE_FRAME = "panda_grasptarget_hand"


@functools.lru_cache(maxsize=None)
def two_joint_robot() -> KinematicModel:
    """Planar 2-DOF arm (2 revolute + fixed EE frame 'link_23')."""
    return build_model(TWO_JOINT_SPEC)


@functools.lru_cache(maxsize=None)
def franka_panda() -> KinematicModel:
    """9-DOF Franka Panda (7 revolute + 2 prismatic fingers), EE frame
    'panda_grasptarget_hand'.

    RMP_PANDA_CAPS=fine (read at model build, i.e. trace time) swaps the
    25-primitive mesh-fitted capsule set for the 47-primitive FINE table
    (models/specs._PANDA_CAPS_FINE) — an experiment knob for the
    capsule-tier geometry-fidelity studies, ~1.9x the collision pairs."""
    import os
    if os.environ.get("RMP_PANDA_CAPS") == "fine":
        from rmp_tpu.models.specs import with_fine_capsules
        return build_model(with_fine_capsules(PANDA_SPEC))
    return build_model(PANDA_SPEC)


UR5_Q_READY = np.array([0.0, -1.5708, 1.2, -1.2, -1.5708, 0.0],
                       dtype=np.float32)
UR5_EE_FRAME = "ee_fixed_joint"


def ur5() -> KinematicModel:
    """6-DOF UR5 (generic-pipeline demo robot; models/specs.UR5_SPEC)."""
    from rmp_tpu.models.specs import UR5_SPEC, build_model
    return build_model(UR5_SPEC)


@functools.lru_cache(maxsize=None)
def dual_panda(separation: float = 0.9) -> KinematicModel:
    """Two Panda arms on one kinematic tree, bases `separation` apart on the
    y axis facing each other (models/specs.make_dual_spec): an 18-DOF
    multi-robot scene using every single-robot code path unchanged."""
    from rmp_tpu.models.specs import PANDA_SPEC, build_model, make_dual_spec
    half = separation / 2.0
    return build_model(make_dual_spec(
        PANDA_SPEC, offset_a=(0.0, half, 0.0), offset_b=(0.0, -half, 0.0),
        yaw_a=-np.pi / 2.0, yaw_b=np.pi / 2.0))


def dual_panda_q_ready(model: KinematicModel) -> np.ndarray:
    """Ready pose for a dual-Panda model: each motor takes the single-Panda
    ready value of its unprefixed joint (motor order interleaves the arms,
    so values are mapped BY NAME, never by position)."""
    single = franka_panda()
    by_name = dict(zip(single.motor_names, PANDA_Q_READY))
    return np.asarray([by_name[name[2:]] for name in model.motor_names],
                      np.float32)
