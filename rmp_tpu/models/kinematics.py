"""Differentiable forward kinematics, TPU-native.

Replaces the reference's tf.function FK (kinematics.py:155-270): instead of a
string-keyed hash lookup + padded gather + sequential `reduce_matrix_prod`
while-loop per frame, we compute ALL frame transforms in one trace-time
unrolled sweep over the (static, <=13-deep) joint tree — one 4x4 matmul per
joint total, shared across every frame and every downstream taskmap.

Derivatives come from `jax.jvp` / `jax.jacfwd` (forward mode: output dims
<= 16, input dims <= 9, so forward-mode beats the reference's double
GradientTape + per-element backward passes, kinematics.py:253-270).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rmp_tpu.models.urdf import PRISMATIC, REVOLUTE, ROOT, KinematicModel
from rmp_tpu.ops import geom

Array = jax.Array


def joint_transforms(model: KinematicModel, q: Array) -> Array:
    """Local transforms parent->child for all frames: (F, 4, 4).

    q: (n_q,) motor-ordered joint positions.
    """
    q = jnp.asarray(q, dtype=jnp.float32)
    # scatter motor q into per-frame slots (fixed joints get 0)
    q_pad = jnp.concatenate([q, jnp.zeros((1,), q.dtype)])
    gather_idx = jnp.asarray(
        [qi if qi >= 0 else model.n_q for qi in model.q_index], dtype=jnp.int32)
    q_frames = q_pad[gather_idx]                              # (F,)

    axis = jnp.asarray(model.axis)                            # (F, 3)
    is_rev = jnp.asarray(
        [1.0 if t == REVOLUTE else 0.0 for t in model.joint_type],
        dtype=jnp.float32)[:, None, None]
    is_pris = jnp.asarray(
        [1.0 if t == PRISMATIC else 0.0 for t in model.joint_type],
        dtype=jnp.float32)[:, None, None]

    R_rev = geom.rotation_matrix_from_axis_angle(axis, q_frames)  # (F,3,3)
    T_rev = geom.hom(R_rev, jnp.zeros((model.n_frames, 3), jnp.float32))
    t_pris = q_frames[:, None] * axis
    T_pris = geom.hom(jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32),
                                       (model.n_frames, 3, 3)), t_pris)
    T_fixed = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                               (model.n_frames, 4, 4))
    T_var = is_rev * T_rev + is_pris * T_pris \
        + (1.0 - is_rev - is_pris) * T_fixed
    return geom.mm(jnp.asarray(model.T_constant), T_var)


def fk_all(model: KinematicModel, q: Array, base: Array | None = None) -> Array:
    """World transforms of every frame: (F, 4, 4).

    The parent sweep is unrolled at trace time (model.parent is static), so
    XLA sees a flat chain of F fused 4x4 matmuls with full CSE across frames.
    base: optional (4, 4) world pose of the robot base (default identity).
    """
    T_local = joint_transforms(model, q)
    world: list[Array] = []
    for i, p in enumerate(model.parent):
        if p == ROOT:
            Ti = T_local[i] if base is None else geom.mm(base, T_local[i])
        else:
            Ti = geom.mm(world[p], T_local[i])
        world.append(Ti)
    return jnp.stack(world)


def fk_frame(model: KinematicModel, q: Array, frame_idx: int,
             base: Array | None = None) -> Array:
    """World transform of a single frame (4, 4); frame_idx is a static int.

    Only the ancestor chain of `frame_idx` is computed (the reference gathers
    a padded chain-index tensor instead, kinematics.py:183-193,241-247).
    """
    chain = model.chain(frame_idx)
    T_local = joint_transforms(model, q)
    T = T_local[chain[0]] if base is None else geom.mm(base, T_local[chain[0]])
    for i in chain[1:]:
        T = geom.mm(T, T_local[i])
    return T


def fk_position(model: KinematicModel, q: Array, frame_idx: int) -> Array:
    return fk_frame(model, q, frame_idx)[:3, 3]


def differentiate(fn, q: Array, qd: Array):
    """(x, xd, J, c) of any smooth map x = fn(q), given q̇.

    x  = fn(q)
    xd = J q̇                       (one jvp)
    J  = ∂fn/∂q                    (jacfwd: n_q jvps)
    c  = J̇ q̇ = (∂(J q̇)/∂q) q̇      (one jvp of the jvp)

    Replaces the reference's nested-GradientTape machinery
    (helper/rmp_helper.py:3-60, kinematics.py:253-270).
    Output shapes: x (d,), xd (d,), J (d, n_q), c (d,).
    """
    x, xd = jax.jvp(fn, (q,), (qd,))
    J = jax.jacfwd(fn)(q)
    _, c = jax.jvp(lambda qq: jax.jvp(fn, (qq,), (qd,))[1], (q,), (qd,))
    return x, xd, J, c


def fk_differentiate(model: KinematicModel, q: Array, qd: Array,
                     frame_idx: int):
    """(x16, ẋ16, J 16 x n_q, c16) of the flattened 4x4 of one frame.

    Capability parity with reference UrdfForwardKinematic.differentiate
    (kinematics.py:250-270).
    """
    fn = lambda qq: fk_frame(model, qq, frame_idx).reshape(16)
    return differentiate(fn, q, qd)


_FK_JIT_CACHE: dict[tuple, "callable"] = {}


def _model_fingerprint(model: KinematicModel) -> tuple:
    """Structural key over everything fk_all reads. Cached on the instance
    (id()-keyed caches can alias after GC and pin models alive via the jitted
    closure; a content key makes equal models share one compilation and
    bounds the cache by the number of DISTINCT models)."""
    fp = getattr(model, "_rmp_fk_fingerprint", None)
    if fp is None:
        import hashlib

        import numpy as np
        h = hashlib.sha1()
        h.update(np.ascontiguousarray(model.T_constant, np.float64).tobytes())
        h.update(np.ascontiguousarray(model.axis, np.float64).tobytes())
        fp = (model.name, model.parent, model.joint_type, model.q_index,
              h.hexdigest())
        object.__setattr__(model, "_rmp_fk_fingerprint", fp)  # frozen dataclass
    return fp


def fk_all_jit(model: KinematicModel, q: Array) -> Array:
    """Jitted fk_all; compiled once per structurally-distinct model."""
    key = _model_fingerprint(model)
    fn = _FK_JIT_CACHE.get(key)
    if fn is None:
        fn = jax.jit(lambda qq: fk_all(model, qq))
        _FK_JIT_CACHE[key] = fn
    return fn(q)
