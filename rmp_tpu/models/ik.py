"""Inverse kinematics: damped least squares, jit-compiled.

Replaces the reference's only IK call — PyBullet's
p.calculateInverseKinematics (experiments/franka_panda/04_nullspace_control.py:31-32)
— with an on-device iterative DLS solver over the differentiable FK.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rmp_tpu.models import kinematics as K
from rmp_tpu.models.urdf import KinematicModel
from rmp_tpu.ops import geom

Array = jax.Array


def _rotation_error(R_current: Array, R_target: Array) -> Array:
    """so(3) error vector e with R_target ≈ exp([e]x) R_current."""
    R_err = geom.mm(R_target, R_current.T)
    # vee of the skew-symmetric part, scaled by angle/sin(angle)
    w = jnp.stack([R_err[2, 1] - R_err[1, 2],
                   R_err[0, 2] - R_err[2, 0],
                   R_err[1, 0] - R_err[0, 1]])
    cos_a = jnp.clip(0.5 * (jnp.trace(R_err) - 1.0), -1.0, 1.0)
    angle = jnp.arccos(cos_a)
    scale = jnp.where(angle < 1e-6, 0.5, angle / (2.0 * jnp.sin(angle) + 1e-12))
    return scale * w


def inverse_kinematics(model: KinematicModel, frame: str | int,
                       target_position: Array,
                       target_orientation_quat: Array | None = None,
                       q_init: Array | None = None,
                       iterations: int = 200, damping: float = 1e-2,
                       step_scale: float = 0.5,
                       respect_limits: bool = True) -> Array:
    """Solve q with fk(q)[frame] at target (position, optional xyzw quat)."""
    idx = model.frame_index(frame) if isinstance(frame, str) else frame
    target_position = jnp.asarray(target_position, jnp.float32)
    q0 = (jnp.zeros(model.n_q, jnp.float32) if q_init is None
          else jnp.asarray(q_init, jnp.float32))
    R_target = (None if target_orientation_quat is None else
                geom.rotation_matrix_from_quaternion(
                    jnp.asarray(target_orientation_quat, jnp.float32)))

    def error(q):
        T = K.fk_frame(model, q, idx)
        e_pos = target_position - T[:3, 3]
        if R_target is None:
            return e_pos
        return jnp.concatenate([e_pos, _rotation_error(T[:3, :3], R_target)])

    def body(_, q):
        e = error(q)
        J = jax.jacfwd(error)(q)            # (m, n); J = -d(fk)/dq
        JT = J.T
        m = e.shape[0]
        A = geom.mm(J, JT) + (damping ** 2) * jnp.eye(m, dtype=jnp.float32)
        dq = -step_scale * (JT @ jnp.linalg.solve(A, e))
        q = q + dq
        if respect_limits:
            q = jnp.clip(q, jnp.asarray(model.q_lower),
                         jnp.asarray(model.q_upper))
        return q

    return jax.lax.fori_loop(0, iterations, body, q0)
