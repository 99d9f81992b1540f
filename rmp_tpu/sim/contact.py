"""Contact dynamics: penalty-based normal + Coulomb-style tangential forces.

The reference delegates contact entirely to PyBullet's C++ LCP solver
(simulation.py:381, stepSimulation); its RMP demos are designed to stay
contact-free, which is what makes trajectory parity feasible (SURVEY.md §7).
This module supplies the missing capability for the torque-level simulation
path: spring-damper contact forces at the analytic closest points
(link capsules vs obstacles and vs the ground plane z = 0), mapped to joint
torques through the contact-point Jacobians from the twist-generator FK
derivatives.

Opt-in (`physics_step(..., contact=True)` / Env.contact_mode): the contact-
free parity scenes are unaffected.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from rmp_tpu.models.fk_derivatives import fk_derivatives
from rmp_tpu.models.urdf import KinematicModel
from rmp_tpu.sim.collision import ObstacleSet, link_world_capsules_all

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ContactParams:
    # gains sized for explicit semi-implicit Euler at dt ~ 5-10 ms: the
    # penalty spring's dt*sqrt(k/m) must stay well below 1 or the contact
    # injects energy (classic explicit stiff-contact bounce)
    stiffness: float = 2000.0      # N/m penalty spring
    damping: float = 50.0          # N s/m normal damper
    friction: float = 0.5          # Coulomb-ish tangential coefficient
    ground: bool = True            # include the z=0 plane


def _point_kinematics(T16_row, Td16_row, J16_row, p_world):
    """Velocity and Jacobian of a world point rigidly attached to a frame.

    o = frame-local coordinates of the point (frozen); then
    v = (Ṫ [o;1])[:3],  J[:, j] = (∂T/∂q_j [o;1])[:3].
    """
    T = T16_row.reshape(4, 4)
    o = jnp.linalg.solve(T, jnp.concatenate([p_world, jnp.ones(1)]))
    o = jax.lax.stop_gradient(o)
    v = (Td16_row.reshape(4, 4) @ o)[:3]
    J = jnp.einsum("abn,b->an", J16_row.reshape(4, 4, -1), o)[:3]
    return v, J


def contact_torques(model: KinematicModel, q: Array, qd: Array,
                    obstacles: ObstacleSet | None,
                    params: ContactParams = ContactParams()) -> Array:
    """Joint torques from all penetrating contacts (n_q,)."""
    T16, Td16, J16, _ = fk_derivatives(model, q, qd)
    T_all = T16.reshape(-1, 4, 4)
    # ALL collision primitives (multi-capsule links): contact against the
    # first primitive only left the rest of the link intangible
    p0, p1, radius, prim_rows = link_world_capsules_all(model, T_all)
    frames = model.collision_frames
    P = p0.shape[0]
    n = model.n_q

    contacts = []  # (primitive index, point_on_link (3,), normal (3,), depth)
    if obstacles is not None and obstacles.count > 0:
        from rmp_tpu.sim.collision import capsule_capsule_query
        K = obstacles.count
        a0 = p0[:, None, :].repeat(K, 1)
        a1 = p1[:, None, :].repeat(K, 1)
        ra = radius[:, None].repeat(K, 1)
        b0 = jnp.broadcast_to(obstacles.p0[None], (P, K, 3))
        b1 = jnp.broadcast_to(obstacles.p1[None], (P, K, 3))
        rb = jnp.broadcast_to(obstacles.radius[None], (P, K))
        pos_l, _, normal, dist = capsule_capsule_query(a0, a1, ra, b0, b1, rb)
        for pi in range(P):
            for ki in range(K):
                contacts.append((pi, pos_l[pi, ki], normal[pi, ki],
                                 -dist[pi, ki]))
    if params.ground:
        # capsule vs plane z=0: lowest endpoint minus radius
        for pi in range(P):
            lower = jnp.where(p0[pi, 2] < p1[pi, 2], p0[pi], p1[pi])
            depth = radius[pi] - lower[2]
            point = lower.at[2].add(-radius[pi])
            contacts.append((pi, point, jnp.asarray([0.0, 0.0, 1.0]), depth))

    tau = jnp.zeros(n, jnp.float32)
    for pi, point, normal, depth in contacts:
        f = frames[prim_rows[pi]]
        v, J = _point_kinematics(T16[f], Td16[f], J16[f], point)
        active = depth > 0.0
        v_n = jnp.dot(v, normal)
        f_n = jnp.maximum(params.stiffness * depth - params.damping * v_n, 0.0)
        f_n = jnp.where(active, f_n, 0.0)
        v_t = v - v_n * normal
        f_t = -params.friction * f_n * v_t / (jnp.linalg.norm(v_t) + 1e-4)
        F = f_n * normal + f_t
        tau = tau + J.T @ F
    return tau


# ---------------------------------------------------------------------------
# Hard (impulse-based) contacts: velocity-level LCP via projected Gauss-Seidel
# ---------------------------------------------------------------------------


def _tangent_basis(n):
    """Two unit tangents orthogonal to n (branchless)."""
    ref = jnp.where(jnp.abs(n[2]) < 0.9, jnp.asarray([0.0, 0.0, 1.0]),
                    jnp.asarray([1.0, 0.0, 0.0]))
    t1 = jnp.cross(n, ref)
    t1 = t1 / (jnp.linalg.norm(t1) + 1e-9)
    t2 = jnp.cross(n, t1)
    return t1, t2


def _contact_rows(model: KinematicModel, q: Array, qd: Array,
                  obstacles: ObstacleSet | None, ground: bool):
    """Contact rows for ALL candidate pairs (static count).

    Returns (J_n (C, n), depth (C,), v_n (C,), J_t (2C, n), v_t (2C,)) where
    J_n maps q̇ to the normal approach velocity of each contact (positive =
    separating) and J_t to the two tangential slip velocities. Inactive pairs
    are handled by the solver's complementarity (λ=0).
    """
    T16, Td16, J16, _ = fk_derivatives(model, q, qd)
    T_all = T16.reshape(-1, 4, 4)
    p0, p1, radius, prim_rows = link_world_capsules_all(model, T_all)
    frames = model.collision_frames
    P = p0.shape[0]

    rows_J, rows_depth, rows_vn = [], [], []
    rows_Jt, rows_vt = [], []

    def add(prim_idx, point, normal, depth):
        f = frames[prim_rows[prim_idx]]
        v, J = _point_kinematics(T16[f], Td16[f], J16[f], point)
        rows_J.append(normal @ J)
        rows_depth.append(depth)
        rows_vn.append(jnp.dot(v, normal))
        t1, t2 = _tangent_basis(normal)
        rows_Jt.append(t1 @ J)
        rows_Jt.append(t2 @ J)
        rows_vt.append(jnp.dot(v, t1))
        rows_vt.append(jnp.dot(v, t2))

    if obstacles is not None and obstacles.count > 0:
        from rmp_tpu.sim.collision import capsule_capsule_query
        K = obstacles.count
        a0 = p0[:, None, :].repeat(K, 1)
        a1 = p1[:, None, :].repeat(K, 1)
        ra = radius[:, None].repeat(K, 1)
        b0 = jnp.broadcast_to(obstacles.p0[None], (P, K, 3))
        b1 = jnp.broadcast_to(obstacles.p1[None], (P, K, 3))
        rb = jnp.broadcast_to(obstacles.radius[None], (P, K))
        pos_l, _, normal, dist = capsule_capsule_query(a0, a1, ra, b0, b1, rb)
        for pi in range(P):
            for ki in range(K):
                add(pi, pos_l[pi, ki], normal[pi, ki], -dist[pi, ki])
    if ground:
        for pi in range(P):
            lower = jnp.where(p0[pi, 2] < p1[pi, 2], p0[pi], p1[pi])
            add(pi, lower.at[2].add(-radius[pi]),
                jnp.asarray([0.0, 0.0, 1.0]), radius[pi] - lower[2])

    return (jnp.stack(rows_J), jnp.stack(rows_depth), jnp.stack(rows_vn),
            jnp.stack(rows_Jt), jnp.stack(rows_vt))


def impulse_contact_velocity(model: KinematicModel, q: Array, qd: Array,
                             dt: float,
                             obstacles: ObstacleSet | None = None,
                             ground: bool = True,
                             restitution: float = 0.0,
                             friction: float = 0.5,
                             baumgarte: float = 0.2,
                             slop: float = 1e-3,
                             iterations: int = 12,
                             cfm: float = 1e-3,
                             return_impulses: bool = False) -> Array:
    """q̇ after resolving contact impulses (hard contacts + box friction).

    Velocity-level LCP:  v⁺ = v + A λ,  0 ≤ λ_n ⊥ v⁺_n + bias ≥ 0, with
    tangential impulses box-clamped to ±μ λ_n — projected Gauss-Seidel on
    the Delassus operator A = J M⁻¹ Jᵀ with Baumgarte positional bias (the
    solver family of PyBullet's C++ btSequentialImpulseConstraintSolver).

    cfm: constraint-force-mixing regularization (Bullet/ODE-style soft
    constraint): the solved system is (A + cfm·I) λ + rhs ⊥ λ. Without it
    PGS DIVERGES on near-singular Delassus rows (measured: a contact
    normal with diag(A) ~ 6e-4 — effective mass ~1500 kg — coupled to
    friction rows grew λ without bound while the velocity residual stayed
    put). cfm=1e-3 softens ordinary contacts (diag ~0.2-1) by < 0.5%
    and bounds pathological rows at |rhs|/cfm;
    tests/test_contact.py::test_impulse_solver_matches_enumerative_lcp
    validates the regularized solve against an exact enumerative LCP
    oracle.

    return_impulses=True additionally returns λ (3C,) ordered
    [normals (C), tangents (2C)] for consumers that need the KKT
    certificate (tests, contact-force observers)."""
    from rmp_tpu.sim.dynamics import mass_matrix

    J_n, depth, v_n, J_t, v_t = _contact_rows(model, q, qd, obstacles, ground)
    C = J_n.shape[0]
    active = depth > 0.0

    J_all = jnp.concatenate([J_n, J_t])                   # (3C, n)
    M = mass_matrix(model, q) + 1e-6 * jnp.eye(model.n_q, dtype=jnp.float32)
    MinvJT = jnp.linalg.solve(M, J_all.T)                 # (n, 3C)
    A = J_all @ MinvJT                                    # (3C, 3C) Delassus
    diag = jnp.maximum(jnp.diagonal(A), 1e-8) + cfm

    # normal target: v_n+ >= -e * v_n- + baumgarte * (depth - slop)/dt
    bias_n = restitution * jnp.minimum(v_n, 0.0) \
        - baumgarte * jnp.maximum(depth - slop, 0.0) / dt
    rhs = jnp.concatenate([v_n + bias_n, v_t])            # (3C,)

    def body(_, lam):
        def norm_row(i, lam):
            resid = rhs[i] + A[i] @ lam + cfm * lam[i]
            new = jnp.maximum(lam[i] - resid / diag[i], 0.0)
            new = jnp.where(active[i], new, 0.0)
            return lam.at[i].set(new)
        lam = jax.lax.fori_loop(0, C, norm_row, lam)

        def fric_row(r, lam):
            i = C + r                                     # tangent row index
            ci = r // 2                                   # owning contact
            resid = rhs[i] + A[i] @ lam + cfm * lam[i]
            limit = friction * lam[ci]
            new = jnp.clip(lam[i] - resid / diag[i], -limit, limit)
            new = jnp.where(active[ci], new, 0.0)
            return lam.at[i].set(new)
        return jax.lax.fori_loop(0, 2 * C, fric_row, lam)

    lam = jax.lax.fori_loop(0, iterations, body,
                            jnp.zeros(3 * C, jnp.float32))
    qd_post = qd + MinvJT @ lam
    return (qd_post, lam) if return_impulses else qd_post
