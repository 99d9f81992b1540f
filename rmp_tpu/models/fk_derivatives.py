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
    fkd = FkDerivatives(model, q, qd)
    T, Td, J, c = zip(*(fkd.full_row(k) for k in range(model.n_frames)))
    return (jnp.stack(T), jnp.stack(Td), jnp.stack(J), jnp.stack(c))


class FkDerivatives:
    """Shared FK-derivative recursion with LAZY per-frame product emission.

    __init__ runs the world-frame recursion once (T, W, Ẇ, G per frame —
    the part every consumer shares); the final products are emitted only
    for the (frame, representation) pairs consumers actually request:

      full_row(k)  -> (T16 (16,), Td16 (16,), J16 (16, n), c16 (16,))
      trans_row(k) -> (p (3,), ṗ (3,), Jp (3, n), cp (3,))  — translation
                      rows only, computed DIRECTLY as (3,4)-vector products
                      (position/distance taskmaps read nothing else; the
                      full 16-row products for 10 collision frames were the
                      single largest flagship intermediate, and slicing
                      stacked full rows after the fact measured 21% SLOWER
                      than this — the slices broke producer fusion)

    This replaces fk_derivatives' all-frames stacking (consumers then
    re-gathered subsets: ~7% of flagship device time) — core.fk_bundle
    hands this object to the combine engine, which stacks exactly the rows
    each policy consumes.
    """

    def __init__(self, model: KinematicModel, q: Array, qd: Array):
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
                Wd[i] = Wd_par + qd_i * (geom.mm(W_par, Gi)
                                         - geom.mm(Gi, W_par))

        self.model = model
        self.n = n
        self._T, self._W, self._Wd, self._G = T, W, Wd, G
        self._full_cache: dict = {}
        self._trans_cache: dict = {}

    @property
    def T16(self):
        """All world transforms as per-frame (16,) rows (distance context)."""
        return tuple(t.reshape(16) for t in self._T)

    def full_row(self, k: int):
        """(T16, Td16, J16 (16, n), c16) for frame k.

        NOTE r2 negative result: hand-stacking these per-frame products
        into single batched mm's measured 5-14% SLOWER end-to-end — the
        stacks materialize concat intermediates XLA otherwise fuses away.
        Keep per-frame products; XLA's own fusion wins here."""
        if k in self._full_cache:
            return self._full_cache[k]
        model, n = self.model, self.n
        T, W, Wd, G = self._T, self._W, self._Wd, self._G
        Td16 = geom.mm(W[k], T[k]).reshape(16)
        c16 = geom.mm(Wd[k] + geom.mm(W[k], W[k]), T[k]).reshape(16)
        # one G_j @ T_k product per actuated ancestor j, static stacking
        zero16 = jnp.zeros((16,), jnp.float32)
        anc = {model.q_index[j]: j for j in model.chain(k)
               if G[j] is not None}
        cols = [geom.mm(G[anc[m]], T[k]).reshape(16) if m in anc else zero16
                for m in range(n)]
        row = (T[k].reshape(16), Td16, jnp.stack(cols, axis=-1), c16)
        self._full_cache[k] = row
        return row

    def trans_row(self, k: int):
        """(p, ṗ, Jp (3, n), cp) — translation rows of frame k, computed
        directly as (3,4)·(4,) products: ṗ = (W T e₄)₃, cp = ((Ẇ + W²) T
        e₄)₃, Jp column j = (G_j T e₄)₃ — a quarter of the full-row FLOPs
        and no post-hoc slicing of stacked rows (which measured 21% slower:
        the slices broke producer fusion)."""
        if k in self._trans_cache:
            return self._trans_cache[k]
        model, n = self.model, self.n
        T, W, Wd, G = self._T, self._W, self._Wd, self._G
        Tc = T[k][:, 3]                                   # (4,) hom. origin
        p = Tc[:3]
        pd = geom.mv(W[k][:3, :], Tc)
        cp = (geom.mv(W[k][:3, :], geom.mv(W[k], Tc))
              + geom.mv(Wd[k][:3, :], Tc))
        zero3 = jnp.zeros((3,), jnp.float32)
        anc = {model.q_index[j]: j for j in model.chain(k)
               if G[j] is not None}
        cols = [geom.mv(G[anc[m]][:3, :], Tc) if m in anc else zero3
                for m in range(n)]
        row = (p, pd, jnp.stack(cols, axis=-1), cp)
        self._trans_cache[k] = row
        return row
