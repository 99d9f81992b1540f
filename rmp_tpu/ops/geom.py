"""SE(3) / rotation math, TPU-native (pure jnp, fp32, broadcast-batched).

Provides the same capability surface as the reference's rotation/SE(3) helpers
(reference: kinematics.py:12-152) but written batch-last-axes style: every
function accepts arbitrary leading batch dimensions and is `vmap`/`jit`
friendly.  No dynamic shapes, no string handling, no while-loops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# TPU MXU defaults fp32 matmuls to bfloat16 passes (~1e-3 error); kinematic
# chain products and metric pullbacks need true fp32. All small-matrix
# products in this framework go through `mm` / the HIGHEST-precision einsums.
HIGHEST = jax.lax.Precision.HIGHEST


_SMALL = 8      # max contraction dim for the VPU multiply-reduce lowering
_SMALL_OUT = 32  # max output dims for it (bounds the broadcast intermediate)
# _SMALL_OUT history: 8 -> 16 fixed the flagship's n_q=9 W = M J products
# (one mis-routed batched dot was 18% of device time); 16 -> 32 fixes the
# same cliff for the DUAL-arm tree (n_q=18: geom.py's matmul fallback
# measured 37.7% of dual device time; the widened guard benched dual
# 1.15M -> see ROADMAP). The broadcast intermediate stays <= 32*8*32
# elements per batch row — XLA keeps it in-register inside the fusion.


def mm(a: Array, b: Array) -> Array:
    """Batched matmul, true fp32.

    For tiny static CONTRACTION dims (<= 8, e.g. the 4x4 chain products
    that dominate this workload) the product is lowered as broadcast
    multiply-reduce on the VPU: XLA fuses whole chains of these into a few
    kernels, whereas tiny `dot` ops each become a separate latency-bound
    MXU dispatch (~100x slower end-to-end for the FK derivative sweep).
    The output dims only bound the (m, k, n) broadcast intermediate — they
    may exceed the contraction limit (r3 finding: the old `n <= 8` guard
    sent every n_q=9-column W = M J through a batched MXU dot_general that
    alone was 18% of flagship device time).
    """
    if (a.shape[-1] <= _SMALL and a.shape[-2] <= _SMALL_OUT
            and b.shape[-1] <= _SMALL_OUT):
        return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)
    return jnp.matmul(a, b, precision=HIGHEST)


def mv(a: Array, v: Array) -> Array:
    """Batched matrix-vector product, true fp32 (VPU path for tiny dims)."""
    if a.shape[-1] <= _SMALL and a.shape[-2] <= _SMALL_OUT:
        return jnp.sum(a * v[..., None, :], axis=-1)
    return jnp.einsum("...ij,...j->...i", a, v, precision=HIGHEST)


# ---------------------------------------------------------------------------
# Elementary rotations
# ---------------------------------------------------------------------------


def rot_x(angle: Array) -> Array:
    """Rotation about x. angle: (...,) -> (..., 3, 3).

    Capability parity with reference kinematics.py:22-32 (R_x).
    """
    c, s = jnp.cos(angle), jnp.sin(angle)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    rows = [o, z, z, z, c, -s, z, s, c]
    return jnp.stack(rows, axis=-1).reshape(angle.shape + (3, 3))


def rot_y(angle: Array) -> Array:
    """Rotation about y. angle: (...,) -> (..., 3, 3). (ref kinematics.py:34-44)"""
    c, s = jnp.cos(angle), jnp.sin(angle)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    rows = [c, z, s, z, o, z, -s, z, c]
    return jnp.stack(rows, axis=-1).reshape(angle.shape + (3, 3))


def rot_z(angle: Array) -> Array:
    """Rotation about z. angle: (...,) -> (..., 3, 3). (ref kinematics.py:46-56)"""
    c, s = jnp.cos(angle), jnp.sin(angle)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    rows = [c, -s, z, s, c, z, z, z, o]
    return jnp.stack(rows, axis=-1).reshape(angle.shape + (3, 3))


# ---------------------------------------------------------------------------
# Homogeneous transforms
# ---------------------------------------------------------------------------


def hom(R: Array, t: Array) -> Array:
    """Homogeneous transform from R (..., 3, 3) and t (..., 3) -> (..., 4, 4).

    Capability parity with reference kinematics.py:58-71.
    """
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    Rt = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.zeros(batch + (1, 4), dtype=R.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([Rt, bottom], axis=-2)


def hom_inverse(T: Array) -> Array:
    """Inverse of a rigid transform (..., 4, 4) without a general solve."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -mv(Rt, t)
    return hom(Rt, ti)


def transform_point(T: Array, p: Array) -> Array:
    """Apply (..., 4, 4) rigid transform to points (..., 3)."""
    return mv(T[..., :3, :3], p) + T[..., :3, 3]


def rotate_vector(T_or_R: Array, v: Array) -> Array:
    """Rotate vectors (..., 3) by the rotation part of T (4x4) or R (3x3)."""
    R = T_or_R[..., :3, :3]
    return mv(R, v)


# ---------------------------------------------------------------------------
# Conversions
# ---------------------------------------------------------------------------


def euler_from_rotation_matrix(R: Array) -> Array:
    """Extrinsic-XYZ (roll-pitch-yaw) euler angles from (..., 3, 3) -> (..., 3).

    Gimbal-lock guarded identically in spirit to reference kinematics.py:74-96
    (division is protected when |cos(theta_y)| < 1e-6).
    """
    r00 = R[..., 0, 0]
    r10 = R[..., 1, 0]
    r20 = R[..., 2, 0]
    r21 = R[..., 2, 1]
    r22 = R[..., 2, 2]

    theta_y = -jnp.arcsin(jnp.clip(r20, -1.0, 1.0))
    cos_y = jnp.cos(theta_y)
    safe_cos_y = jnp.where(jnp.abs(cos_y) < 1e-6, jnp.ones_like(cos_y), cos_y)
    theta_z = jnp.arctan2(r10 / safe_cos_y, r00 / safe_cos_y)
    theta_x = jnp.arctan2(r21 / safe_cos_y, r22 / safe_cos_y)
    return jnp.stack([theta_x, theta_y, theta_z], axis=-1)


def rotation_matrix_from_axis_angle(axis: Array, angle: Array) -> Array:
    """Rodrigues formula. axis (..., 3) (unit or zero), angle (...,) -> (..., 3, 3).

    A zero axis yields the identity rotation (used for fixed joints).
    Capability parity with reference kinematics.py:99-121.
    """
    c = jnp.cos(angle)[..., None, None]
    s = jnp.sin(angle)[..., None, None]
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zero = jnp.zeros_like(x)
    skew = jnp.stack(
        [zero, -z, y, z, zero, -x, -y, x, zero], axis=-1
    ).reshape(axis.shape[:-1] + (3, 3))
    outer = axis[..., :, None] * axis[..., None, :]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis.dtype), outer.shape)
    # for zero axis: outer = 0, skew = 0 -> R = c*I + (1-c)*0 ... must be I.
    # cos(q)*I is wrong for fixed joints, but fixed joints are masked upstream;
    # we additionally guard here so a zero axis always returns identity.
    R = c * eye + s * skew + (1.0 - c) * outer
    axis_norm_sq = jnp.sum(axis * axis, axis=-1)[..., None, None]
    return jnp.where(axis_norm_sq > 0.5, R, eye)


def rotation_matrix_from_rpy(rpy: Array) -> Array:
    """Extrinsic XYZ (URDF rpy) -> rotation matrix.  rpy (..., 3) -> (..., 3, 3).

    URDF convention: R = Rz(yaw) @ Ry(pitch) @ Rx(roll).

    NOTE: the reference (kinematics.py:123-127) computes
    R_x(roll) @ R_y(pitch) @ R_z(yaw), i.e. *intrinsic* XYZ. Its own FK parity
    tests pass only because every URDF origin used has at most one non-zero
    rpy component, where both conventions agree... except they don't for
    mixed rpy. We follow the reference's composition order to preserve
    trajectory parity on its assets (all of which have single-axis rpy, where
    the two conventions coincide).
    """
    roll, pitch, yaw = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    return mm(mm(rot_x(roll), rot_y(pitch)), rot_z(yaw))


def rotation_matrix_from_quaternion(q: Array) -> Array:
    """Quaternion (x, y, z, w) -> (..., 3, 3). PyBullet ordering (x,y,z,w).

    Capability parity with reference kinematics.py:129-152 (which uses
    (w,x,y,z) indexing into a pybullet-ordered quat -- a latent bug we do not
    reproduce; we implement the standard correct conversion).
    """
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = x * x + y * y + z * z + w * w
    s = jnp.where(n > 0, 2.0 / jnp.maximum(n, 1e-12), jnp.zeros_like(n))
    xx, yy, zz = x * x * s, y * y * s, z * z * s
    xy, xz, yz = x * y * s, x * z * s, y * z * s
    wx, wy, wz = w * x * s, w * y * s, w * z * s
    rows = [
        1.0 - (yy + zz), xy - wz, xz + wy,
        xy + wz, 1.0 - (xx + zz), yz - wx,
        xz - wy, yz + wx, 1.0 - (xx + yy),
    ]
    return jnp.stack(rows, axis=-1).reshape(q.shape[:-1] + (3, 3))


def quaternion_from_rotation_matrix(R: Array) -> Array:
    """Shepperd's method, branch-free for jit: (..., 3, 3) -> (..., 4) as (x,y,z,w).

    Capability parity with reference helper/trigonometry_helper.py:53-105
    (getQuaternionFromSO3), re-derived branch-free via `jnp.where` so it jits.
    """
    r00, r01, r02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    r10, r11, r12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    r20, r21, r22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    trace = r00 + r11 + r22

    def _safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 1e-12))

    # candidate 0: trace dominant
    s0 = 0.5 * _safe_sqrt(1.0 + trace)
    q0 = jnp.stack(
        [(r21 - r12) / (4 * s0), (r02 - r20) / (4 * s0), (r10 - r01) / (4 * s0),
         s0], axis=-1)
    # candidate 1: r00 dominant
    s1 = 0.5 * _safe_sqrt(1.0 + 2 * r00 - trace)
    q1 = jnp.stack(
        [s1, (r10 + r01) / (4 * s1), (r02 + r20) / (4 * s1),
         (r21 - r12) / (4 * s1)], axis=-1)
    # candidate 2: r11 dominant
    s2 = 0.5 * _safe_sqrt(1.0 + 2 * r11 - trace)
    q2 = jnp.stack(
        [(r10 + r01) / (4 * s2), s2, (r21 + r12) / (4 * s2),
         (r02 - r20) / (4 * s2)], axis=-1)
    # candidate 3: r22 dominant
    s3 = 0.5 * _safe_sqrt(1.0 + 2 * r22 - trace)
    q3 = jnp.stack(
        [(r02 + r20) / (4 * s3), (r21 + r12) / (4 * s3), s3,
         (r10 - r01) / (4 * s3)], axis=-1)

    cands = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4cand, 4)
    scores = jnp.stack([trace, r00, r11, r22], axis=-1)
    best = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)
    q = q[..., 0, :]
    # canonical sign: w >= 0
    return jnp.where(q[..., 3:4] < 0, -q, q)


def angular_velocity_to_euler_rates_matrix(eulers: Array) -> Array:
    """H(euler) with euler_rates = H @ omega_world for extrinsic-XYZ eulers.

    Capability parity with reference helper/trigonometry_helper.py:18-38
    (get_H_forEulerXYZ) -- note the reference returns the matrix whose
    *inverse* maps omega->euler_rates; we return H_inv directly composed of
    the same terms, so callers get euler_rates = H @ omega.
    """
    _, beta, gamma = eulers[..., 0], eulers[..., 1], eulers[..., 2]
    sb, cb = jnp.sin(beta), jnp.cos(beta)
    sg, cg = jnp.sin(gamma), jnp.cos(gamma)
    # reference H (omega = H @ euler_rates xyz-extrinsic); invert analytically
    H = jnp.stack(
        [cb * cg, -sg, jnp.zeros_like(cb),
         cb * sg, cg, jnp.zeros_like(cb),
         -sb, jnp.zeros_like(cb), jnp.ones_like(cb)], axis=-1
    ).reshape(eulers.shape[:-1] + (3, 3))
    return jnp.linalg.inv(H)
