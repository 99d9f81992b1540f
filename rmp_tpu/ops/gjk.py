"""Batched convex closest-point queries via support functions (GJK family).

Replaces PyBullet's C++ GJK mesh queries EXACTLY (reference
simulation.py:462-484, p.getClosestPoints) for separated shapes: link
collision geometry is the convex hull of the actual mesh (assets/
panda_hulls.npz) instead of a capsule fit, and obstacle cylinders use their
exact support function instead of a capsule approximation.

TPU-first design:
  * simplex GJK with a FIXED 4-slot simplex and FIXED iteration count under
    `lax.scan` — branchless, static-shaped, vmappable over (batch, link,
    obstacle) — instead of the classic CPU GJK's data-dependent simplex
    case analysis (the Johnson subalgorithm evaluates vertex subsets and
    selects by where-chain; newest-support-in-slot-0 rotation halves the
    in-loop subset work);
  * every iteration is a max-over-vertices support reduce (one variadic
    lax.reduce on TPU) plus scalar simplex algebra — no gathers, no
    dynamic shapes, no lax.linalg on tiny systems (explicit Cramer);
  * witness points on both shapes ride along per simplex slot, so the
    query returns the same (point_on_A, point_on_B, normal, distance) tuple
    as the capsule queries (sim/collision.py) and PyBullet.
  (A plain Frank-Wolfe descent was the first implementation — sublinear
  zigzag left a 20 mm accuracy tail; the simplex solver is exact on
  polytope contacts.)

The solver minimizes  |x| over x in A ⊖ B  and converges to the separation
distance when the shapes are disjoint. On overlap the minimum is 0 and the
normal degenerates — callers fall back to the capsule query there (the
hybrid in sim/collision.robot_obstacle_distances_hull), which is exactly
the regime where the capsule penetration depth is the better-behaved
surrogate anyway.

Accuracy: the support gap  g = x·(x - s)/|x|  certifies the result
(|x| - d* <= g). 10 iterations measure max 0.21 mm vs a 32-iteration
reference on the randomized Panda-hull workload (tests/test_gjk.py);
iterations are a static arg.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array
_EPS = 1e-12


# ---------------------------------------------------------------------------
# Support functions. Each returns the extreme point of the shape in world
# frame for world direction d (need not be normalized). All broadcast over
# leading batch axes of d and the shape parameters.
# ---------------------------------------------------------------------------


def _support_hull_impl(verts: Array, d: Array) -> Array:
    def two_pass(verts, d):
        # CPU/GPU: variadic custom-computation reduce lowers to a scalar
        # loop on CPU (~13x slower test tier); the two-pass max+select is
        # fine there (the HBM-traffic argument is a TPU concern)
        dots = jnp.sum(verts * d[..., None, :], axis=-1)      # (..., V)
        m = jnp.max(dots, axis=-1, keepdims=True)
        w = (dots >= m).astype(verts.dtype)
        return jnp.sum(w[..., None] * verts, axis=-2) / (
            jnp.sum(w, axis=-1)[..., None] + _EPS)

    def variadic(verts, d):
        dx, dy, dz = d[..., None, 0], d[..., None, 1], d[..., None, 2]
        vx = jnp.broadcast_to(verts[..., 0], jnp.broadcast_shapes(
            verts[..., 0].shape, dx.shape))
        vy = jnp.broadcast_to(verts[..., 1], vx.shape)
        vz = jnp.broadcast_to(verts[..., 2], vx.shape)
        dots = vx * dx + vy * dy + vz * dz                    # (..., V)
        neg = jnp.float32(-jnp.inf)

        def comb(a, b):
            keep = a[0] >= b[0]
            return tuple(jnp.where(keep, ai, bi) for ai, bi in zip(a, b))

        _, x, y, z = jax.lax.reduce(
            (dots, vx, vy, vz),
            (neg, jnp.float32(0), jnp.float32(0), jnp.float32(0)),
            comb, (dots.ndim - 1,))
        return jnp.stack([x, y, z], axis=-1)

    # resolved per compilation platform (not trace-time default_backend, so
    # a TPU-default process jitting for CPU still gets the right lowering)
    return jax.lax.platform_dependent(verts, d, tpu=variadic,
                                      default=two_pass)


@jax.custom_jvp
def support_hull(verts: Array, d: Array) -> Array:
    """Convex polytope support point. verts: (..., V, 3) vertex table;
    d: (..., 3). Exact ties resolve to the first argmax vertex.

    ONE variadic lax.reduce on TPU carrying (dot, x, y, z): the per-element
    dot is unrolled elementwise so XLA fuses it INTO the reduction — the
    naive max-then-select formulation materializes the (batch, pairs, V) dot
    tensor to HBM between its two reduction kernels (~130 MB per GJK
    iteration at production batches). CPU/GPU keep the two-pass max+select
    (the variadic custom-computation reduce lowers to a scalar loop there).

    DIFFERENTIABLE via an explicit envelope rule (the TPU reduce has no
    autodiff rule of its own): the maximizing vertex is locally constant in
    d, so ∂s/∂d = 0 almost everywhere, and ∂s/∂verts is the tie-averaged
    vertex selection. That makes the whole GJK query (and hull-mode
    rollouts) jvp/vjp-safe on every platform — by the envelope theorem the
    resulting distance derivative n·(∂pa/∂pose − ∂pb/∂pose) is the exact
    a.e. derivative, validated against finite differences in
    tests/test_gjk.py. (The fused Pallas kernel path carries the same
    envelope rule as a custom_vjp — ops/pallas_gjk._gjk_bwd — so
    reverse-mode consumers stay on the fast kernel.)"""
    return _support_hull_impl(verts, d)


@functools.partial(support_hull.defjvp, symbolic_zeros=True)
def _support_hull_jvp(primals, tangents):
    verts, d = primals
    v_dot, d_dot = tangents
    del d_dot                      # ∂s/∂d = 0 a.e. (argmax locally constant)
    s = _support_hull_impl(verts, d)
    if isinstance(v_dot, jax.custom_derivatives.SymbolicZero):
        # the standard case: static vertex tables (link-local hulls are
        # compile-time constants) — skip the (..., V) tangent reduction
        return s, jnp.zeros_like(s)
    # moving/parameterized vertices: tangent of the tie-averaged selection
    # (same mask semantics as the two_pass primal)
    dots = jnp.sum(verts * d[..., None, :], axis=-1)
    m = jnp.max(dots, axis=-1, keepdims=True)
    w = (dots >= m).astype(verts.dtype)
    t = (jnp.sum(w[..., None] * v_dot, axis=-2)
         / (jnp.sum(w, axis=-1)[..., None] + _EPS))
    return s, jnp.broadcast_to(t, s.shape)


def support_capsule(p0: Array, p1: Array, r: Array, d: Array) -> Array:
    """Capsule (segment ⊕ ball). p0, p1: (..., 3); r: (...,)."""
    dn = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + _EPS)
    pick = jnp.sum(d * (p1 - p0), axis=-1, keepdims=True) > 0
    end = jnp.where(pick, p1, p0)
    return end + r[..., None] * dn


def support_cylinder_unit(p0: Array, p1: Array, an: Array, r: Array,
                          d: Array) -> Array:
    """support_cylinder with the unit axis `an` precomputed — hoist the
    normalization out of the GJK iteration loop (the axis is constant per
    query; renormalizing it every support call measured ~5% of hull-mode
    device time)."""
    d_ax = jnp.sum(d * an, axis=-1, keepdims=True)
    d_perp = d - d_ax * an
    pn = d_perp / (jnp.linalg.norm(d_perp, axis=-1, keepdims=True) + _EPS)
    end = jnp.where(d_ax > 0, p1, p0)
    return end + r[..., None] * pn


def support_cylinder(p0: Array, p1: Array, r: Array, d: Array) -> Array:
    """EXACT flat-capped cylinder with axis p0->p1 and radius r (the URDF /
    PyBullet cylinder the reference scenes use; the capsule path rounds the
    caps off). Degenerates safely: r=0 -> segment, p0=p1 -> disk."""
    axis = p1 - p0
    an = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + _EPS)
    return support_cylinder_unit(p0, p1, an, r, d)


def support_sphere(c: Array, r: Array, d: Array) -> Array:
    dn = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + _EPS)
    return c + r[..., None] * dn


# ---------------------------------------------------------------------------
# Solver: GJK with a fixed 4-slot simplex and a branchless Johnson
# distance subalgorithm (all 15 vertex subsets evaluated, feasible
# minimum-norm candidate selected by a where-chain). A fixed-slot,
# fixed-iteration formulation instead of the classic CPU version's
# data-dependent simplex cases — identical math, vmappable.
# ---------------------------------------------------------------------------

# nonempty subsets of the 4 simplex slots, by size
_SINGLES = ((0,), (1,), (2,), (3,))
_PAIRS = ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))
_TRIPLES = ((0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3))
_QUAD = (0, 1, 2, 3)
_FEAS = -1e-6     # barycentric feasibility slack


def _johnson(Y: Array, newest_only: bool = False):
    """Closest point of conv(Y) to the origin, branchless.

    Y: (..., 4, 3) simplex slots (duplicates allowed — degenerate subsets
    are masked infeasible by Gram-determinant guards; singletons keep the
    search total). Returns (x (..., 3), lam (..., 4)): the closest point
    and its barycentric weights over the 4 slots.

    Correctness: the true closest point lies in the relative interior of
    exactly one face, whose UNCLAMPED affine projection is feasible
    (all-nonnegative barycentrics) and equals it; every other feasible
    subset projects at no smaller norm. So min-norm over feasible subsets
    is exact.

    newest_only=True evaluates only subsets CONTAINING SLOT 0 (8 of 15):
    the classic GJK invariant — the optimal subset of the updated simplex
    contains the just-inserted support point (slot 0 by construction in
    closest_points). ~40% less subset work in the iteration loop; the
    final projection after the loop uses the full enumeration.
    """
    y = [Y[..., i, :] for i in range(4)]
    singles = ((0,),) if newest_only else _SINGLES
    pairs = (((0, 1), (0, 2), (0, 3)) if newest_only else _PAIRS)
    triples = (((0, 1, 2), (0, 1, 3), (0, 2, 3)) if newest_only
               else _TRIPLES)
    dot = {(i, j): jnp.sum(y[i] * y[j], axis=-1)
           for i in range(4) for j in range(4) if i <= j}

    def d(i, j):
        return dot[(i, j) if i <= j else (j, i)]

    batch = Y.shape[:-2]
    big = jnp.full(batch, jnp.inf, Y.dtype)
    best_n2, best_x = big, jnp.zeros(batch + (3,), Y.dtype)
    best_lam = jnp.zeros(batch + (4,), Y.dtype)

    def consider(feas, x, lam_slots, best):
        best_n2, best_x, best_lam = best
        n2 = jnp.sum(x * x, axis=-1)
        take = feas & (n2 < best_n2)
        t3 = take[..., None]
        return (jnp.where(take, n2, best_n2), jnp.where(t3, x, best_x),
                jnp.where(t3, lam_slots, best_lam))

    def scatter(pairs):
        lam = [jnp.zeros(batch, Y.dtype)] * 4
        for i, v in pairs:
            lam[i] = v
        return jnp.stack(lam, axis=-1)

    best = (best_n2, best_x, best_lam)
    one = jnp.ones(batch, Y.dtype)
    for (i,) in singles:
        best = consider(jnp.ones(batch, bool), y[i], scatter([(i, one)]), best)
    for i, j in pairs:
        e2 = d(i, i) - 2 * d(i, j) + d(j, j)          # |y_j - y_i|^2
        t = (d(i, i) - d(i, j)) / (e2 + _EPS)
        feas = (e2 > 1e-12) & (t >= _FEAS) & (t <= 1 - _FEAS)
        x = y[i] + t[..., None] * (y[j] - y[i])
        best = consider(feas, x, scatter([(i, 1 - t), (j, t)]), best)
    for i, j, k in triples:
        # minimize |y_i + u (y_j - y_i) + v (y_k - y_i)|^2 (2x2 Cramer)
        a11 = d(j, j) - 2 * d(i, j) + d(i, i)
        a22 = d(k, k) - 2 * d(i, k) + d(i, i)
        a12 = d(j, k) - d(i, j) - d(i, k) + d(i, i)
        b1 = d(i, j) - d(i, i)
        b2 = d(i, k) - d(i, i)
        det = a11 * a22 - a12 * a12
        # SCALE-AWARE degeneracy guard (absolute fp32 thresholds let
        # duplicate-slot Gram matrices through as garbage solves)
        ok = jnp.abs(det) > 1e-6 * a11 * a22 + 1e-20
        u = (-b1 * a22 + b2 * a12) / jnp.where(ok, det, 1.0)
        v = (-a11 * b2 + a12 * b1) / jnp.where(ok, det, 1.0)
        feas = ok & (u >= _FEAS) & (v >= _FEAS) & (1 - u - v >= _FEAS)
        x = y[i] + u[..., None] * (y[j] - y[i]) + v[..., None] * (y[k] - y[i])
        best = consider(feas, x,
                        scatter([(i, 1 - u - v), (j, u), (k, v)]), best)
    # full tetrahedron: origin inside (projection = origin) iff the 3x3
    # barycentric solve is feasible. Explicit Cramer on scalars — lax.linalg
    # det/solve on tiny batched systems are latency-bound TPU custom calls
    # (measured ~7000x slowdown of the whole hull query)
    i, j, k, m = _QUAD
    e = [y[j] - y[i], y[k] - y[i], y[m] - y[i]]
    g = [[jnp.sum(e[r] * e[c], axis=-1) for c in range(3)] for r in range(3)]
    b = [-jnp.sum(e[r] * y[i], axis=-1) for r in range(3)]
    c00 = g[1][1] * g[2][2] - g[1][2] * g[2][1]
    c01 = g[1][2] * g[2][0] - g[1][0] * g[2][2]
    c02 = g[1][0] * g[2][1] - g[1][1] * g[2][0]
    det = g[0][0] * c00 + g[0][1] * c01 + g[0][2] * c02
    scale = g[0][0] * g[1][1] * g[2][2]
    ok = jnp.abs(det) > 1e-6 * scale + 1e-30
    inv_det = 1.0 / jnp.where(ok, det, 1.0)
    u = (b[0] * c00
         + b[1] * (g[0][2] * g[2][1] - g[0][1] * g[2][2])
         + b[2] * (g[0][1] * g[1][2] - g[0][2] * g[1][1])) * inv_det
    v = (b[0] * c01
         + b[1] * (g[0][0] * g[2][2] - g[0][2] * g[2][0])
         + b[2] * (g[0][2] * g[1][0] - g[0][0] * g[1][2])) * inv_det
    w = (b[0] * c02
         + b[1] * (g[0][1] * g[2][0] - g[0][0] * g[2][1])
         + b[2] * (g[0][0] * g[1][1] - g[0][1] * g[1][0])) * inv_det
    feas = (ok & (u >= _FEAS) & (v >= _FEAS)
            & (w >= _FEAS) & (1 - u - v - w >= _FEAS))
    x = jnp.zeros(batch + (3,), Y.dtype)              # origin enclosed
    best = consider(feas, x, scatter([(i, 1 - u - v - w), (j, u), (k, v),
                                      (m, w)]), best)
    _, best_x, best_lam = best
    return best_x, best_lam


def closest_points(support_a, support_b, d0: Array, iters: int = 16):
    """min-norm point of A ⊖ B by simplex GJK (fixed slots/iterations).

    support_a/support_b: fn(d) -> world extreme point (broadcast-batched).
    d0: (..., 3) initial direction guess (e.g. center_B - center_A; any
    nonzero vector works, a good guess converges faster).

    Returns (pos_on_a, pos_on_b, normal_on_b, distance, gap):
      * distance = |pa - pb| (>= 0; ~0 means touching/overlapping),
      * normal_on_b points from B toward A (PyBullet contactNormalOnB),
      * gap certifies: true_distance ∈ [distance - gap, distance].

    Each iteration evicts the least-supporting simplex slot, rotates the
    old slot 0 into it, and inserts the new support at slot 0 (so the
    in-loop Johnson solve can use newest_only); witness points on A and B
    ride along per slot. Polytope pairs terminate exactly (the simplex
    reaches the supporting face); smooth shapes (capsule/cylinder/sphere
    sides) converge linearly — 10 iterations measured max 0.21 mm vs a
    32-iteration reference on the randomized Panda-hull workload.
    """
    sa0 = support_a(-d0)
    sb0 = support_b(d0)
    Ya = jnp.stack([sa0] * 4, axis=-2)                # (..., 4, 3)
    Yb = jnp.stack([sb0] * 4, axis=-2)

    def body(carry, _):
        Ya, Yb, done = carry
        # newest-insert-in-slot-0 invariant lets the in-loop solve skip
        # the 7 subsets not containing slot 0
        x, lam = _johnson(Ya - Yb, newest_only=True)
        sa = support_a(-x)
        sb = support_b(x)
        # convergence: support gap |x|^2 - x.s <= tol means x is optimal
        # over the WHOLE Minkowski difference. FREEZE the simplex then —
        # inserting the (duplicate) support again degrades the simplex and
        # a degenerate solve can spuriously report the origin enclosed.
        n2 = jnp.sum(x * x, axis=-1)
        gap = n2 - jnp.sum(x * (sa - sb), axis=-1)
        done = done | (gap <= 1e-5 * n2 + 1e-12)
        # evict the least-supporting slot, then rotate: old slot 0 moves
        # into the evicted slot and the NEW support takes slot 0
        m = jnp.min(lam, axis=-1, keepdims=True)
        is_min = lam <= m
        first = jnp.cumsum(is_min.astype(lam.dtype), axis=-1) <= 1
        evict = (is_min & first)[..., None]               # (..., 4, 1)
        live = ~done[..., None, None]
        old0a = Ya[..., 0:1, :]
        old0b = Yb[..., 0:1, :]
        Ya = jnp.where(evict & live, old0a, Ya)
        Yb = jnp.where(evict & live, old0b, Yb)
        slot0 = jnp.asarray([True, False, False, False])[:, None]
        Ya = jnp.where(slot0 & live, sa[..., None, :], Ya)
        Yb = jnp.where(slot0 & live, sb[..., None, :], Yb)
        return (Ya, Yb, done), None

    done0 = jnp.zeros(jnp.broadcast_shapes(
        sa0.shape[:-1], sb0.shape[:-1]), bool)
    # rolled scan: unroll=True measured NO runtime gain on TPU (the carry
    # is small relative to the per-iteration compute) while multiplying
    # compile cost by the iteration count
    (Ya, Yb, _), _ = jax.lax.scan(body, (Ya, Yb, done0), None, length=iters)
    x, lam = _johnson(Ya - Yb)
    pa = jnp.sum(lam[..., None] * Ya, axis=-2)
    pb = jnp.sum(lam[..., None] * Yb, axis=-2)
    dist = jnp.linalg.norm(x, axis=-1)
    n = x / (dist[..., None] + 1e-9)
    # certificate: support gap in the final direction
    s = support_a(-x) - support_b(x)
    gap = jnp.sum(x * (x - s), axis=-1) / (dist + 1e-9)
    return pa, pb, n, dist, gap
