"""Analytic FK derivatives via world-frame twist generators.

Forward-mode autodiff of the FK chain costs ~(n_q + 5) re-evaluations of the
whole kinematic graph per control tick (jacfwd tangents + nested jvp for the
curvature). This module computes the same quantities in closed form with a
fixed, tiny set of batched 4x4 products — the structure-exploiting
"speed-of-light" path for the combine engine.

Math. Let T_k(q) be the world transform of frame k and, for joint j with
parent-side rigid transform A_j = T_parent(j) @ T_const_j, let

    G_j = A_j E_j A_j^{-1}            (world twist generator, 4x4)

with E_j = [[skew(axis), 0], [0, 0]] (revolute) or [[0, axis], [0, 0]]
(prismatic). Then for any descendant frame k of joint j:

    ∂T_k/∂q_j = G_j T_k                                    (Jacobian columns)
    Ṫ_k       = W_k T_k,      W_k = W_parent + q̇_j G_j     (velocity)
    T̈_k|q̈=0  = (Ẇ_k + W_k W_k) T_k                        (curvature)
    Ẇ_k       = Ẇ_parent + q̇_k [W_parent(k), G_k]          (generator drift)

Verified against the autodiff path (tests/test_fk_derivatives.py), which is
itself parity-tested against the reference implementation.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp

from rmp_tpu.models.kinematics import joint_transforms
from rmp_tpu.models.urdf import FIXED, REVOLUTE, ROOT, KinematicModel
from rmp_tpu.ops import geom

Array = jax.Array


def _generator(model: KinematicModel, i: int, A: Array) -> Array | None:
    """World twist generator G_i = A E_i A^{-1} (4, 4); None for fixed."""
    jt = model.joint_type[i]
    if jt == FIXED:
        return None
    axis = jnp.asarray(model.axis[i])
    E = jnp.zeros((4, 4), jnp.float32)
    if jt == REVOLUTE:
        x, y, z = axis
        E = E.at[:3, :3].set(jnp.asarray(
            [[0.0, -z, y], [z, 0.0, -x], [-y, x, 0.0]], jnp.float32))
    else:  # PRISMATIC
        E = E.at[:3, 3].set(axis)
    return geom.mm(geom.mm(A, E), geom.hom_inverse(A))


def fk_derivatives(model: KinematicModel, q: Array, qd: Array):
    """(T16, Td16, J16, c16): (F,16), (F,16), (F,16,n), (F,16), closed form.

    Equivalent to stacking fk_differentiate over all frames
    (models/kinematics.py) at a small fixed cost: ~4 batched 4x4 products per
    joint plus one per (ancestor, frame) pair.
    """
    F = model.n_frames
    n = model.n_q
    T_local = joint_transforms(model, q)
    qd = jnp.asarray(qd, jnp.float32)
    qd_pad = jnp.concatenate([qd, jnp.zeros(1, qd.dtype)])
    idx = [i if i >= 0 else n for i in model.q_index]

    eye = jnp.eye(4, dtype=jnp.float32)
    zero = jnp.zeros((4, 4), jnp.float32)

    T = [None] * F      # world transforms
    W = [None] * F      # velocity operators: Ṫ_k = W_k T_k
    Wd = [None] * F     # their drifts:       Ẇ_k
    G = [None] * F      # per-joint world generators (None for fixed)

    for i in range(F):
        p = model.parent[i]
        T_par = eye if p == ROOT else T[p]
        W_par = zero if p == ROOT else W[p]
        Wd_par = zero if p == ROOT else Wd[p]

        A = geom.mm(T_par, jnp.asarray(model.T_constant[i]))
        T[i] = geom.mm(T_par, T_local[i])
        Gi = _generator(model, i, A)
        G[i] = Gi
        if Gi is None:
            W[i] = W_par
            Wd[i] = Wd_par
        else:
            qd_i = qd_pad[idx[i]]
            W[i] = W_par + qd_i * Gi
            Wd[i] = Wd_par + qd_i * (geom.mm(W_par, Gi) - geom.mm(Gi, W_par))

    T16 = jnp.stack(T).reshape(F, 16)
    # NOTE r2 negative result: hand-stacking these per-frame products into
    # single batched mm's ((F,4,4) stacks, and the (ancestor, frame) pair
    # stack for J16) measured 5-14% SLOWER end-to-end — the stacks
    # materialize concat intermediates XLA otherwise fuses away. Keep the
    # per-frame loops; XLA's own fusion wins here.
    Td = [geom.mm(W[k], T[k]) for k in range(F)]
    Td16 = jnp.stack(Td).reshape(F, 16)
    c = [geom.mm(Wd[k] + geom.mm(W[k], W[k]), T[k]) for k in range(F)]
    c16 = jnp.stack(c).reshape(F, 16)

    # Jacobian columns: one G_j @ T_k product per (actuated ancestor j, frame
    # k), assembled by static stacking (no scatter ops — everything fuses)
    zero16 = jnp.zeros((16,), jnp.float32)
    frame_rows = []
    for k in range(F):
        anc = {model.q_index[j]: j for j in model.chain(k) if G[j] is not None}
        cols = [geom.mm(G[anc[m]], T[k]).reshape(16) if m in anc else zero16
                for m in range(n)]
        frame_rows.append(jnp.stack(cols, axis=-1))          # (16, n)
    J16 = jnp.stack(frame_rows)                              # (F, 16, n)
    return T16, Td16, J16, c16
