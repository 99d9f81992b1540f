"""Articulated rigid-body dynamics, TPU-native (jit/vmap-ready, fp32).

This replaces the PyBullet C++ dynamics engine the reference depends on:
  inverse_dynamics  <-> p.calculateInverseDynamics (reference simulation.py:370-374)
  forward_dynamics  <-> p.stepSimulation's implicit solve (simulation.py:381)
  semi_implicit_euler_step <-> PyBullet's integrator (velocity then position)

Algorithms: recursive Newton-Euler (RNEA) in link coordinates, trace-time
unrolled over the static joint tree (<= 13 bodies); the joint-space mass
matrix comes from the ID trick M[:, j] = ID(q, 0, e_j) - gravity/bias terms,
vmapped over columns.  Everything is a pure function of (model-closure, q,
q̇, q̈/τ) — batched environments via vmap, device meshes via shard_map.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rmp_tpu.models.kinematics import joint_transforms
from rmp_tpu.models.urdf import (FIXED, PRISMATIC, REVOLUTE, ROOT,
                                 KinematicModel)
from rmp_tpu.ops import geom

Array = jax.Array

# numpy, NOT jnp: a module-scope device array would initialize the XLA
# backend at import time, breaking jax.distributed.initialize (which must
# run before any backend use) and post-import platform configuration
import numpy as _np  # noqa: E402

GRAVITY = _np.asarray([0.0, 0.0, -9.81], dtype=_np.float32)


def _cross(a, b):
    return jnp.cross(a, b)


def inverse_dynamics(model: KinematicModel, q: Array, qd: Array, qdd: Array,
                     gravity: Array | None = None) -> Array:
    """Joint torques tau (n_q,) realizing q̈ at (q, q̇) — RNEA.

    Link-frame recursion with rotation matrices; fixed joints propagate
    velocities/forces but contribute no DOF. Gravity enters as a fictitious
    base acceleration (-g).
    """
    g = jnp.asarray(GRAVITY if gravity is None else gravity, jnp.float32)
    q = jnp.asarray(q, jnp.float32)
    qd = jnp.asarray(qd, jnp.float32)
    qdd = jnp.asarray(qdd, jnp.float32)

    F = model.n_frames
    T_local = joint_transforms(model, q)           # (F, 4, 4) parent->i
    mass = jnp.asarray(model.mass)
    com = jnp.asarray(model.com)
    inertia = jnp.asarray(model.inertia)
    axis = jnp.asarray(model.axis)

    # per-frame joint velocity/acceleration scalars (0 for fixed)
    qd_pad = jnp.concatenate([qd, jnp.zeros(1, qd.dtype)])
    qdd_pad = jnp.concatenate([qdd, jnp.zeros(1, qdd.dtype)])
    idx = jnp.asarray([i if i >= 0 else model.n_q for i in model.q_index])
    qd_f = qd_pad[idx]
    qdd_f = qdd_pad[idx]

    omega = [None] * F          # angular velocity of body i, in frame i
    omegad = [None] * F         # angular acceleration
    a_lin = [None] * F          # linear acceleration of frame-i origin
    # forward sweep
    for i in range(F):
        p = model.parent[i]
        R_pi = T_local[i, :3, :3]                  # frame i axes in parent
        r = T_local[i, :3, 3]                      # frame i origin in parent
        iRp = R_pi.T
        if p == ROOT:
            w_p = jnp.zeros(3, jnp.float32)
            wd_p = jnp.zeros(3, jnp.float32)
            a_p = -g                               # gravity trick
        else:
            w_p, wd_p, a_p = omega[p], omegad[p], a_lin[p]

        jt = model.joint_type[i]
        a_joint = axis[i]
        if jt == REVOLUTE:
            w_i = iRp @ w_p + qd_f[i] * a_joint
            wd_i = iRp @ wd_p + qdd_f[i] * a_joint \
                + _cross(iRp @ w_p, qd_f[i] * a_joint)
            ac_i = iRp @ (a_p + _cross(wd_p, r) + _cross(w_p, _cross(w_p, r)))
        elif jt == PRISMATIC:
            w_i = iRp @ w_p
            wd_i = iRp @ wd_p
            ac_i = iRp @ (a_p + _cross(wd_p, r) + _cross(w_p, _cross(w_p, r))) \
                + 2.0 * _cross(w_i, qd_f[i] * a_joint) + qdd_f[i] * a_joint
        else:  # FIXED
            w_i = iRp @ w_p
            wd_i = iRp @ wd_p
            ac_i = iRp @ (a_p + _cross(wd_p, r) + _cross(w_p, _cross(w_p, r)))
        omega[i], omegad[i], a_lin[i] = w_i, wd_i, ac_i

    # body wrenches at each frame origin
    f_body = [None] * F
    n_body = [None] * F
    for i in range(F):
        c = com[i]
        a_com = a_lin[i] + _cross(omegad[i], c) \
            + _cross(omega[i], _cross(omega[i], c))
        Fi = mass[i] * a_com
        Ni = inertia[i] @ omegad[i] + _cross(omega[i], inertia[i] @ omega[i])
        f_body[i] = Fi
        n_body[i] = Ni + _cross(c, Fi)

    # backward sweep: accumulate child wrenches into parents
    children: list[list[int]] = [[] for _ in range(F)]
    for i, p in enumerate(model.parent):
        if p != ROOT:
            children[p].append(i)

    f_tot = [None] * F
    n_tot = [None] * F
    for i in reversed(range(F)):
        fi, ni = f_body[i], n_body[i]
        for ch in children[i]:
            R_ic = T_local[ch, :3, :3]             # child axes in frame i
            r_ic = T_local[ch, :3, 3]
            f_ch = R_ic @ f_tot[ch]
            fi = fi + f_ch
            ni = ni + R_ic @ n_tot[ch] + _cross(r_ic, f_ch)
        f_tot[i], n_tot[i] = fi, ni

    tau_frames = []
    for i in range(F):
        jt = model.joint_type[i]
        if jt == REVOLUTE:
            tau_frames.append(jnp.dot(axis[i], n_tot[i]))
        elif jt == PRISMATIC:
            tau_frames.append(jnp.dot(axis[i], f_tot[i]))
    # scatter frame torques into motor order
    tau = jnp.zeros(model.n_q, jnp.float32)
    k = 0
    for i in range(F):
        if model.joint_type[i] != FIXED:
            tau = tau.at[model.q_index[i]].set(tau_frames[k])
            k += 1
    # URDF joint damping (viscous) — PyBullet applies it implicitly
    tau = tau + jnp.asarray(model.joint_damping) * qd
    return tau


def bias_forces(model: KinematicModel, q: Array, qd: Array,
                gravity: Array | None = None) -> Array:
    """h(q, q̇) = C(q, q̇) q̇ + g(q): torques at zero acceleration."""
    return inverse_dynamics(model, q, qd, jnp.zeros(model.n_q, jnp.float32),
                            gravity)


def mass_matrix(model: KinematicModel, q: Array) -> Array:
    """Joint-space inertia M(q) (n_q, n_q) via the ID trick, vmapped columns.

    M[:, j] = ID(q, 0, e_j) with gravity off (unit-acceleration torques).
    """
    n = model.n_q
    zeros = jnp.zeros(n, jnp.float32)
    no_g = jnp.zeros(3, jnp.float32)
    cols = jax.vmap(
        lambda e: inverse_dynamics(model, q, zeros, e, gravity=no_g)
    )(jnp.eye(n, dtype=jnp.float32))
    return cols.T


def mass_matrix_crba(model: KinematicModel, q: Array) -> Array:
    """Joint-space inertia via the Composite Rigid Body Algorithm.

    World-frame formulation: each body's spatial inertia about the origin is
    accumulated up the tree (composite inertias I^c), and
        M[i, j] = S_i^T I^c_{max(i,j)-subtree} S_j
    with S_i the world-frame motion subspace (twist) of joint i. Equivalent
    to `mass_matrix` (ID trick); both are kept — CRBA is O(n d) and serves as
    an independent cross-check (tests/test_dynamics.py).
    """
    from rmp_tpu.models.kinematics import fk_all

    F = model.n_frames
    n = model.n_q
    T = fk_all(model, q)                      # (F, 4, 4)
    R = T[:, :3, :3]
    p = T[:, :3, 3]
    mass = jnp.asarray(model.mass)
    com_w = p + jnp.einsum("fij,fj->fi", R, jnp.asarray(model.com))
    I_w = jnp.einsum("fij,fjk,flk->fil", R, jnp.asarray(model.inertia), R)

    def _skew(v):
        x, y, z = v[..., 0], v[..., 1], v[..., 2]
        zero = jnp.zeros_like(x)
        return jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero],
                         axis=-1).reshape(v.shape[:-1] + (3, 3))

    # spatial inertia of body f about the WORLD origin, world axes:
    # [[I + m cx cx^T_adj, m cx], [m cx^T, m 1]] with cx = skew(com)
    cx = _skew(com_w)                         # (F, 3, 3)
    eye3 = jnp.eye(3, dtype=jnp.float32)
    Itop = I_w + mass[:, None, None] * geom.mm(cx, jnp.swapaxes(cx, -1, -2))
    top = jnp.concatenate([Itop, mass[:, None, None] * cx], axis=-1)
    bot = jnp.concatenate([mass[:, None, None] * jnp.swapaxes(cx, -1, -2),
                           mass[:, None, None] * jnp.broadcast_to(eye3, cx.shape)],
                          axis=-1)
    I_spatial = jnp.concatenate([top, bot], axis=-2)     # (F, 6, 6)

    # composite: add each body's spatial inertia to all its ancestors
    Ic = [I_spatial[f] for f in range(F)]
    for f in reversed(range(F)):
        par = model.parent[f]
        if par != ROOT:
            Ic[par] = Ic[par] + Ic[f]

    # world-frame motion subspaces S_i = [omega; v_origin] per actuated joint
    S = [None] * F
    for f in range(F):
        if model.joint_type[f] == FIXED:
            continue
        axis_w = jnp.einsum("ij,j->i", R[f], jnp.asarray(model.axis[f]))
        if model.joint_type[f] == REVOLUTE:
            S[f] = jnp.concatenate([axis_w, jnp.cross(p[f], axis_w)])
        else:
            S[f] = jnp.concatenate([jnp.zeros(3, jnp.float32), axis_w])

    M = jnp.zeros((n, n), jnp.float32)
    for f in range(F):
        if S[f] is None:
            continue
        i = model.q_index[f]
        FI = jnp.einsum("ab,b->a", Ic[f], S[f])      # force of subtree f
        anc = [g for g in model.chain(f) if S[g] is not None]
        for g in anc:
            j = model.q_index[g]
            val = jnp.dot(S[g], FI)
            M = M.at[i, j].set(val)
            M = M.at[j, i].set(val)
    return M


def forward_dynamics(model: KinematicModel, q: Array, qd: Array,
                     tau: Array, gravity: Array | None = None) -> Array:
    """q̈ = M(q)^{-1} (tau - h(q, q̇)) — the articulated-body response.

    (Replaces PyBullet's internal constraint-free forward dynamics.)
    """
    M = mass_matrix(model, q)
    h = bias_forces(model, q, qd, gravity)
    # small ridge keeps the (near-)massless finger DOFs well-posed in fp32
    M = M + 1e-6 * jnp.eye(model.n_q, dtype=jnp.float32)
    return jnp.linalg.solve(M, tau - h)


def semi_implicit_euler_step(model: KinematicModel, q: Array, qd: Array,
                             qdd: Array, dt: float,
                             enforce_limits: bool = True,
                             enforce_velocity_limits: bool = False):
    """PyBullet-style integration: q̇ += q̈ dt; q += q̇ dt; hard joint limits
    (position clamp + outward-velocity zeroing).

    enforce_velocity_limits clamps q̇ to the model's URDF velocity limits
    (real actuator bounds). OFF by default for reference parity: PyBullet
    does NOT enforce URDF velocity limits under torque control (its own
    maxJointVelocity default is 100 rad/s), and the parity goldens were
    generated without it. Opt in for physically-bounded randomized scenes
    (deep-penetration spawns can otherwise kick ~10 rad/s transients)."""
    qd_new = qd + qdd * dt
    if enforce_velocity_limits:
        vmax = jnp.asarray(model.velocity_limit)
        qd_new = jnp.clip(qd_new, -vmax, vmax)
    q_new = q + qd_new * dt
    if enforce_limits:
        low = jnp.asarray(model.q_lower)
        high = jnp.asarray(model.q_upper)
        below = q_new < low
        above = q_new > high
        q_new = jnp.clip(q_new, low, high)
        qd_new = jnp.where(below & (qd_new < 0), 0.0, qd_new)
        qd_new = jnp.where(above & (qd_new > 0), 0.0, qd_new)
    return q_new, qd_new
