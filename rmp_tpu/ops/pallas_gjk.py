"""Fused Pallas TPU kernel for the batched hull-vs-obstacle GJK query.

The XLA lowering of ops/gjk.closest_points runs the 10-iteration simplex
loop as a lax.scan whose body spans ~15 fusions: every iteration round-trips
the (B, L, K, 4, 3) simplex carries and all Johnson intermediates through
HBM, and the per-op launch overhead dominates (hull-mode trace: ~50% of
device time in non-reduce GJK machinery at 5% of HBM peak — pure latency).

This kernel runs the WHOLE query — support reduces, branchless Johnson
subalgorithm, slot eviction, convergence freeze, final witness extraction —
in one Pallas program. Per grid instance = one (link, obstacle) pair x
BLOCK_B environments:

  * the link's vertex table is a (V, 3) VMEM block selected by the link
    grid index (static per instance — the support reduce is a dense
    (V, SUB, LANES) max with zero HBM traffic);
  * environments live on a (SUB=8, LANES=128) vector tile, so every scalar
    of the Johnson algebra is a fully-utilized VPU op;
  * the simplex (4 slots x two witness sets) stays in VMEM across all
    iterations — the scan carry never exists.

Semantics oracle: ops/gjk.closest_points with the same supports
(tests/test_pallas_gjk.py compares against the XLA path in interpret
mode). Tie-breaking inside the hull support uses the two-pass mask-average
(any convex combination of argmax vertices is a valid support point), so
results can differ from the XLA variadic-reduce path by fp-roundoff on
exact ties — both converge to the same distance within the usual 10-iter
tolerance (max 0.21 mm vs a 32-iter reference).

Used by sim/collision.robot_obstacle_distances_hull_batched on the fused
batched rollout path (B % 128 == 0); the per-env / CPU paths keep the XLA
implementation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

LANES = 128
_EPS = 1e-12
_FEAS = -1e-6     # barycentric feasibility slack (ops/gjk.py)


# -- lane-array 3-vector helpers (a Vec3 is a tuple of 3 (SUB, LANES) arrays)


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _scale(s, a):
    return (s * a[0], s * a[1], s * a[2])


def _add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _where(c, a, b):
    return tuple(jnp.where(c, x, y) for x, y in zip(a, b))


def _johnson_lanes(y, newest_only: bool):
    """Port of ops/gjk._johnson to lane-array Vec3 slots.

    y: list of 4 Vec3. Returns (x Vec3, lam list of 4 lane-arrays): closest
    point of conv(y) to the origin and its barycentric weights."""
    singles = ((0,),) if newest_only else ((0,), (1,), (2,), (3,))
    pairs = (((0, 1), (0, 2), (0, 3)) if newest_only
             else ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)))
    triples = (((0, 1, 2), (0, 1, 3), (0, 2, 3)) if newest_only
               else ((0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)))

    dot = {}
    for i in range(4):
        for j in range(i, 4):
            dot[(i, j)] = _dot(y[i], y[j])

    def d(i, j):
        return dot[(i, j) if i <= j else (j, i)]

    shape = y[0][0].shape
    inf = jnp.full(shape, jnp.inf, jnp.float32)
    zero = jnp.zeros(shape, jnp.float32)
    one = jnp.ones(shape, jnp.float32)
    best_n2 = inf
    best_x = (zero, zero, zero)
    best_lam = [zero, zero, zero, zero]

    def consider(feas, x, lam_pairs, best_n2, best_x, best_lam):
        n2 = _dot(x, x)
        take = feas & (n2 < best_n2)
        lam = [zero, zero, zero, zero]
        for i, v in lam_pairs:
            lam[i] = v
        return (jnp.where(take, n2, best_n2), _where(take, x, best_x),
                [jnp.where(take, l, b) for l, b in zip(lam, best_lam)])

    true_ = jnp.ones(shape, bool)
    for (i,) in singles:
        best_n2, best_x, best_lam = consider(
            true_, y[i], [(i, one)], best_n2, best_x, best_lam)
    for i, j in pairs:
        e2 = d(i, i) - 2 * d(i, j) + d(j, j)
        t = (d(i, i) - d(i, j)) / (e2 + _EPS)
        feas = (e2 > 1e-12) & (t >= _FEAS) & (t <= 1 - _FEAS)
        x = _add(y[i], _scale(t, _sub(y[j], y[i])))
        best_n2, best_x, best_lam = consider(
            feas, x, [(i, 1 - t), (j, t)], best_n2, best_x, best_lam)
    for i, j, k in triples:
        a11 = d(j, j) - 2 * d(i, j) + d(i, i)
        a22 = d(k, k) - 2 * d(i, k) + d(i, i)
        a12 = d(j, k) - d(i, j) - d(i, k) + d(i, i)
        b1 = d(i, j) - d(i, i)
        b2 = d(i, k) - d(i, i)
        det = a11 * a22 - a12 * a12
        ok = jnp.abs(det) > 1e-6 * a11 * a22 + 1e-20
        inv = 1.0 / jnp.where(ok, det, 1.0)
        u = (-b1 * a22 + b2 * a12) * inv
        v = (-a11 * b2 + a12 * b1) * inv
        feas = ok & (u >= _FEAS) & (v >= _FEAS) & (1 - u - v >= _FEAS)
        x = _add(y[i], _add(_scale(u, _sub(y[j], y[i])),
                            _scale(v, _sub(y[k], y[i]))))
        best_n2, best_x, best_lam = consider(
            feas, x, [(i, 1 - u - v), (j, u), (k, v)],
            best_n2, best_x, best_lam)
    # full tetrahedron (explicit 3x3 Cramer on Gram matrix, ops/gjk.py)
    i, j, k, m = 0, 1, 2, 3
    e = [_sub(y[j], y[i]), _sub(y[k], y[i]), _sub(y[m], y[i])]
    g = [[_dot(e[r], e[c]) for c in range(3)] for r in range(3)]
    b = [-_dot(e[r], y[i]) for r in range(3)]
    c00 = g[1][1] * g[2][2] - g[1][2] * g[2][1]
    c01 = g[1][2] * g[2][0] - g[1][0] * g[2][2]
    c02 = g[1][0] * g[2][1] - g[1][1] * g[2][0]
    det = g[0][0] * c00 + g[0][1] * c01 + g[0][2] * c02
    scale = g[0][0] * g[1][1] * g[2][2]
    ok = jnp.abs(det) > 1e-6 * scale + 1e-30
    inv = 1.0 / jnp.where(ok, det, 1.0)
    u = (b[0] * c00
         + b[1] * (g[0][2] * g[2][1] - g[0][1] * g[2][2])
         + b[2] * (g[0][1] * g[1][2] - g[0][2] * g[1][1])) * inv
    v = (b[0] * c01
         + b[1] * (g[0][0] * g[2][2] - g[0][2] * g[2][0])
         + b[2] * (g[0][2] * g[1][0] - g[0][0] * g[1][2])) * inv
    w = (b[0] * c02
         + b[1] * (g[0][1] * g[2][0] - g[0][0] * g[2][1])
         + b[2] * (g[0][0] * g[1][1] - g[0][1] * g[1][0])) * inv
    feas = (ok & (u >= _FEAS) & (v >= _FEAS)
            & (w >= _FEAS) & (1 - u - v - w >= _FEAS))
    best_n2, best_x, best_lam = consider(
        feas, (zero, zero, zero),
        [(i, 1 - u - v - w), (j, u), (k, v), (m, w)],
        best_n2, best_x, best_lam)
    return best_x, best_lam


def _kernel(verts_ref, R_ref, t_ref, p0_ref, p1_ref, an_ref, r_ref,
            cyl_ref, d0_ref, pa_ref, pb_ref, dist_ref, *,
            iters: int, sub: int, mxu: bool = False):
    S, L = sub, LANES

    def lane(ref, *idx):
        return ref[idx].reshape(S, L)

    # link pose (world <- local): R (3, 3) of lane-arrays, t Vec3;
    # obstacle data is PER-PAIR (l, k) — the broad phase compacts each
    # link's obstacle set to its top-M nearest, so slot k of link l can
    # hold a different obstacle than slot k of link l'
    R = [[lane(R_ref, 0, r, c) for c in range(3)] for r in range(3)]
    t = tuple(lane(t_ref, 0, c) for c in range(3))
    p0 = tuple(lane(p0_ref, 0, 0, c) for c in range(3))
    p1 = tuple(lane(p1_ref, 0, 0, c) for c in range(3))
    an = tuple(lane(an_ref, 0, 0, c) for c in range(3))
    r_obs = lane(r_ref, 0, 0, 0)
    is_cyl = lane(cyl_ref, 0, 0, 0) > 0.5
    d0 = tuple(lane(d0_ref, 0, 0, c) for c in range(3))

    # static vertex table: (V,) per-coordinate columns broadcast against
    # the (S, L) env tile inside the support reduce
    vx = verts_ref[0, :, 0][:, None, None]
    vy = verts_ref[0, :, 1][:, None, None]
    vz = verts_ref[0, :, 2][:, None, None]

    def sup_link_vpu(d):
        # link-local support: d_loc = R^T d; dense (V, S, L) dot, support
        # point via the ==-max mask, count-normalized. EXACT ties average
        # to a face/ring point that still achieves the maximal dot — a
        # valid GJK support (measured error identical to a strict-argmax
        # variant on the cluttered workload). ~25% cheaper than the
        # iota/min first-argmax chain: the support reduce is ~80% of
        # kernel device time, so op count here is the kernel's critical
        # path.
        dl = tuple(R[0][c] * d[0] + R[1][c] * d[1] + R[2][c] * d[2]
                   for c in range(3))
        dots = vx * dl[0][None] + vy * dl[1][None] + vz * dl[2][None]
        m = jnp.max(dots, axis=0)
        eq = (dots == m[None]).astype(jnp.float32)
        inv = 1.0 / jnp.sum(eq, axis=0)
        sl = tuple(jnp.sum(eq * vc, axis=0) * inv for vc in (vx, vy, vz))
        # back to world: R s_loc + t
        return tuple(R[c][0] * sl[0] + R[c][1] * sl[1] + R[c][2] * sl[2]
                     + t[c] for c in range(3))

    # MXU variant of the support reduce: the dense dot against the vertex
    # table IS a matmul — verts (V, 3) @ d_local (3, N) with the env tile
    # flattened to the lane dim, and the mask-average numerators/counts a
    # second matmul [1; x; y; z] (4, V) @ eq (V, N). Replaces ~11 V-sized
    # VPU passes with 2 MXU ops + 2 V-sized VPU passes (max, ==).
    # MEASURED DEAD END on the v5e (RMP_GJK_MXU=1): hull bench 3.69M vs
    # 4.93M steps/s for the VPU reduce — the (3, S, L) <-> (3, N)
    # boundary relayouts per support call plus a contraction depth of 3
    # (1/42 MXU row utilization) cost more than the saved VPU passes.
    # Kept as the documented negative result (interpret-mode equivalence
    # pinned in tests/test_pallas_gjk.py); default stays the VPU reduce.
    # Guarded by `if mxu:` so the default VPU kernel structurally contains
    # no MXU-variant ops (no reliance on Mosaic DCE).
    if mxu:
        verts2d = verts_ref[0]                               # (V, 3)
        A2 = jnp.concatenate(
            [jnp.ones((1, verts2d.shape[0]), jnp.float32),
             jnp.transpose(verts2d, (1, 0))], axis=0)        # (4, V)

        def sup_link_mxu(d):
            dl = tuple(R[0][c] * d[0] + R[1][c] * d[1] + R[2][c] * d[2]
                       for c in range(3))
            dflat = jnp.concatenate(
                [x.reshape(1, S * L) for x in dl], axis=0)
            dots = jnp.dot(verts2d, dflat,
                           preferred_element_type=jnp.float32)  # (V, N)
            m = jnp.max(dots, axis=0, keepdims=True)
            eq = (dots == m).astype(jnp.float32)
            sums = jnp.dot(A2, eq, preferred_element_type=jnp.float32)
            sl3 = sums[1:4] / sums[0:1]                      # (3, N)
            sl = tuple(sl3[c].reshape(S, L) for c in range(3))
            return tuple(R[c][0] * sl[0] + R[c][1] * sl[1]
                         + R[c][2] * sl[2] + t[c] for c in range(3))

        sup_link = sup_link_mxu
    else:
        sup_link = sup_link_vpu

    def sup_obs(d):
        # capsule (segment + ball) and flat-capped cylinder, selected by
        # the per-pair tag (ops/gjk.support_capsule / support_cylinder_unit).
        # Normalizations are v / (|v| + eps) — the ORACLE's eps semantics,
        # not rsqrt(|v|^2 + eps): for near-axis-parallel directions
        # (|d_perp| ~ 1e-7) the rsqrt form yields a ~0.1-magnitude pn and
        # the end-cap witness diverges from the XLA path by O(r).
        inv_dn = 1.0 / (jnp.sqrt(_dot(d, d)) + _EPS)
        axis = _sub(p1, p0)
        pick = _dot(d, axis) > 0
        end = _where(pick, p1, p0)
        cap = _add(end, _scale(r_obs * inv_dn, d))
        d_ax = _dot(d, an)
        d_perp = _sub(d, _scale(d_ax, an))
        inv_p = 1.0 / (jnp.sqrt(_dot(d_perp, d_perp)) + _EPS)
        pn = _scale(inv_p, d_perp)
        end_c = _where(d_ax > 0, p1, p0)
        cyl = _add(end_c, _scale(r_obs, pn))
        return _where(is_cyl, cyl, cap)

    sa0 = sup_link(tuple(-c for c in d0))
    sb0 = sup_obs(d0)
    Ya = [list(sa0) for _ in range(4)]
    Yb = [list(sb0) for _ in range(4)]
    done = jnp.zeros((S, L), bool)

    for _ in range(iters):
        Yd = [tuple(a - b for a, b in zip(Ya[i], Yb[i])) for i in range(4)]
        x, lam = _johnson_lanes(Yd, newest_only=True)
        sa = sup_link(tuple(-c for c in x))
        sb = sup_obs(x)
        n2 = _dot(x, x)
        s = _sub(sa, sb)
        gap = n2 - _dot(x, s)
        done = done | (gap <= 1e-5 * n2 + 1e-12)
        # evict first-minimum-weight slot, rotate old slot 0 into it,
        # insert new support at slot 0 (ops/gjk.closest_points body)
        m = jnp.minimum(jnp.minimum(lam[0], lam[1]),
                        jnp.minimum(lam[2], lam[3]))
        live = ~done
        taken = jnp.zeros((S, L), bool)
        old0a, old0b = list(Ya[0]), list(Yb[0])
        for i in range(4):
            e = (lam[i] <= m) & ~taken
            taken = taken | e
            w = e & live
            Ya[i] = [jnp.where(w, o, y) for o, y in zip(old0a, Ya[i])]
            Yb[i] = [jnp.where(w, o, y) for o, y in zip(old0b, Yb[i])]
        Ya[0] = [jnp.where(live, s_, y) for s_, y in zip(sa, Ya[0])]
        Yb[0] = [jnp.where(live, s_, y) for s_, y in zip(sb, Yb[0])]

    Yd = [tuple(a - b for a, b in zip(Ya[i], Yb[i])) for i in range(4)]
    x, lam = _johnson_lanes(Yd, newest_only=False)
    pa = (jnp.zeros((S, L)),) * 3
    pb = (jnp.zeros((S, L)),) * 3
    for i in range(4):
        pa = _add(pa, _scale(lam[i], tuple(Ya[i])))
        pb = _add(pb, _scale(lam[i], tuple(Yb[i])))
    dist = jnp.sqrt(_dot(x, x))

    for c in range(3):
        pa_ref[0, 0, c] = pa[c].reshape(-1)
        pb_ref[0, 0, c] = pb[c].reshape(-1)
    dist_ref[0, 0, 0] = dist.reshape(-1)


def gjk_hull_obstacles(verts: Array, R: Array, t: Array, p0: Array,
                       p1: Array, an: Array, radius: Array, is_cyl: Array,
                       d0: Array, iters: int = 10,
                       interpret: bool = False, mxu: bool | None = None):
    """Public wrapper: resolves env-var knobs, then routes through the
    DIFFERENTIABLE (custom_vjp) kernel call — reverse-mode gradients use
    the envelope-theorem rule in _gjk_bwd (exact a.e. for the distance,
    fixed-feature rigid model for the witnesses), so hull-mode gain tuning
    and neural training run on the fused kernel instead of the ~4.4x-slower
    per-env XLA fallback. Forward-mode (jvp/jacfwd) through this call is
    unsupported — in-tick policy derivatives consume the query output as
    per-tick constants (the reference's Datamanager semantics), so nothing
    on the rollout path jvp's through it."""
    # resolve the env-var knob OUTSIDE the jitted inner: jit caches on the
    # static-arg signature, so an inside-the-trace read would make the
    # second (knob-flipped) call in one process silently reuse the first
    # compilation. CAVEAT: this only covers eager callers — when this
    # function is itself traced inside an outer jit (the fused rollout
    # path), the env vars are read at OUTER-trace time and baked into that
    # compilation; flipping them mid-process silently reuses the outer jit
    # cache. Set RMP_GJK_MXU / RMP_GJK_SUB before the rollout is first
    # traced, or pass mxu= explicitly from the rollout config.
    import os
    if mxu is None:
        mxu = os.environ.get("RMP_GJK_MXU", "0") == "1"
    sub_cap = int(os.environ.get("RMP_GJK_SUB", "32"))
    return _gjk_diff(verts, R, t, p0, p1, an, radius, is_cyl,
                     d0, iters, interpret, mxu, sub_cap)


# -- envelope-theorem gradients for the fused kernel ------------------------
#
# The kernel is a fixed-point solver: its converged witnesses (pa on the
# link hull, pb on the obstacle) characterize the distance as
#   d = |pa - pb|,  pa = R a_loc + t (a_loc fixed in the link frame),
#   pb = foot(s; p0, p1) + rho * u   (s, rho, u fixed in the obstacle's
#                                     segment frame),
# and by the envelope theorem  dd = n . (dpa - dpb)  with n = (pa - pb)/d
# is the EXACT a.e. derivative of the optimal value — the same trick
# ops/gjk.support_hull's custom_jvp uses one level down on the XLA path
# (validated vs finite differences there and in tests/test_pallas_gjk.py
# for this rule). Witness cotangents use the same fixed-local-feature
# rigid model: exact when the active feature is a vertex, first-order on
# faces/edges — matching the a.e. character of the XLA path.
#
# an / is_cyl / d0 / verts get zero cotangents: `an` is derived from
# p0/p1 upstream (its variation is second-order under the rigid model),
# d0 only affects convergence (a.e. zero), vertex tables are static.


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def _gjk_diff(verts, R, t, p0, p1, an, radius, is_cyl, d0,
              iters, interpret, mxu, sub_cap):
    return _gjk_hull_obstacles(verts, R, t, p0, p1, an, radius, is_cyl,
                               d0, iters=iters, interpret=interpret,
                               mxu=mxu, sub_cap=sub_cap)


def _gjk_fwd(verts, R, t, p0, p1, an, radius, is_cyl, d0,
             iters, interpret, mxu, sub_cap):
    out = _gjk_hull_obstacles(verts, R, t, p0, p1, an, radius, is_cyl,
                              d0, iters=iters, interpret=interpret,
                              mxu=mxu, sub_cap=sub_cap)
    pa, pb, dist = out
    return out, (verts, R, t, p0, p1, an, radius, is_cyl, d0,
                 pa, pb, dist)


def _gjk_bwd(iters, interpret, mxu, sub_cap, res, cts):
    del iters, interpret, mxu, sub_cap
    verts, R, t, p0, p1, an, radius, is_cyl, d0, pa, pb, dist = res
    pa_bar, pb_bar, dist_bar = cts
    # layouts: R (L,3,3,B), t (L,3,B); p0/p1/an/d0/pa/pb (L,K,3,B);
    # radius/is_cyl (L,K,1,B); dist (L,K,B)
    eps = 1e-9
    n = (pa - pb) / (dist[:, :, None] + eps)          # (L, K, 3, B)
    g = dist_bar[:, :, None]                          # (L, K, 1, B)

    # link side: pa = R a_loc + t with a_loc = R^T (pa - t) held fixed
    w_a = n * g + pa_bar                              # (L, K, 3, B)
    rel = pa - t[:, None]                             # (L, K, 3, B)
    a_loc = jnp.einsum("lrcb,lkrb->lkcb", R, rel)     # R^T rel
    t_bar = jnp.sum(w_a, axis=1)                      # (L, 3, B)
    R_bar = jnp.einsum("lkrb,lkcb->lrcb", w_a, a_loc)

    # obstacle side: pb = p0 + s (p1 - p0) + rho u with (s, rho, u) fixed;
    # s = axial projection of pb (exactly the witness's segment foot for
    # every capsule/cylinder feature — end caps clip to 0/1)
    w_b = pb_bar - n * g                              # (L, K, 3, B)
    ax = p1 - p0
    len2 = jnp.sum(ax * ax, axis=2, keepdims=True)
    s = jnp.clip(jnp.sum((pb - p0) * ax, axis=2, keepdims=True)
                 / (len2 + eps), 0.0, 1.0)            # (L, K, 1, B)
    foot = p0 + s * ax
    off = pb - foot
    u = off / (jnp.sqrt(jnp.sum(off * off, axis=2, keepdims=True)) + eps)
    p0_bar = (1.0 - s) * w_b
    p1_bar = s * w_b
    r_bar = jnp.sum(u * w_b, axis=2, keepdims=True)   # (L, K, 1, B)

    return (jnp.zeros_like(verts), R_bar, t_bar, p0_bar, p1_bar,
            jnp.zeros_like(an), r_bar, jnp.zeros_like(is_cyl),
            jnp.zeros_like(d0))


_gjk_diff.defvjp(_gjk_fwd, _gjk_bwd)


@functools.partial(jax.jit,
                   static_argnames=("iters", "interpret", "mxu", "sub_cap"))
def _gjk_hull_obstacles(verts: Array, R: Array, t: Array, p0: Array,
                        p1: Array, an: Array, radius: Array, is_cyl: Array,
                        d0: Array, iters: int, interpret: bool, mxu: bool,
                        sub_cap: int = 32):
    """Batched link-hull vs capsule/cylinder closest points, one fused
    kernel.

    verts: (L, V, 3) static link-local vertex tables (same V per link —
    pad by repeating a vertex; harmless under the max-reduce).
    R, t: (L, 3, 3, B) / (L, 3, B) link world poses.
    p0, p1, an: (L, K, 3, B) PER-PAIR obstacle segment ends + unit axis
    (the broad phase compacts each link's obstacles to its top-M nearest,
    so slot k is per-link); radius, is_cyl: (L, K, 1, B).
    d0: (L, K, 3, B) initial direction.

    Returns (pa (L, K, 3, B), pb (L, K, 3, B), dist (L, K, B)) with
    pa - pb == dist * normal exactly (wrapper derives the normal).
    B must be a multiple of 128; SUB=8 sublane tiles are used when
    B % 1024 == 0.
    """
    Lk, V, _ = verts.shape
    K = p0.shape[1]
    B = R.shape[-1]
    assert B % LANES == 0, f"batch {B} must be a multiple of {LANES}"
    # as many sublane rows per instance as divide the batch (cap 32: the
    # (V, sub, 128) support intermediates stay ~1.6 MB in VMEM). Bigger
    # tiles amortize the Mosaic per-op overhead that dominates this
    # kernel: (8,128) -> (32,128) tiles measured a large win.
    # RMP_GJK_SUB overrides the cap (tuning knob, resolved in the public
    # wrapper so it participates in the jit cache key).
    cap = sub_cap
    sub = 1
    for cand in (32, 16, 8, 4, 2):
        if cand <= cap and B % (cand * LANES) == 0:
            sub = cand
            break
    block_b = sub * LANES

    grid = (Lk, K, B // block_b)

    specs = [
        pl.BlockSpec((1, V, 3), lambda l, k, b: (l, 0, 0),
                     memory_space=pltpu.VMEM),                    # verts
        pl.BlockSpec((1, 3, 3, block_b), lambda l, k, b: (l, 0, 0, b),
                     memory_space=pltpu.VMEM),                    # R
        pl.BlockSpec((1, 3, block_b), lambda l, k, b: (l, 0, b),
                     memory_space=pltpu.VMEM),                    # t
        pl.BlockSpec((1, 1, 3, block_b), lambda l, k, b: (l, k, 0, b),
                     memory_space=pltpu.VMEM),                    # p0
        pl.BlockSpec((1, 1, 3, block_b), lambda l, k, b: (l, k, 0, b),
                     memory_space=pltpu.VMEM),                    # p1
        pl.BlockSpec((1, 1, 3, block_b), lambda l, k, b: (l, k, 0, b),
                     memory_space=pltpu.VMEM),                    # an
        # (L, K, 1, B) with an explicit singleton: the TPU lowering
        # requires the last two BLOCK dims to divide (8, 128) or equal
        # the array dims — a (1, block_b) block of a (K, B) array
        # violates that
        pl.BlockSpec((1, 1, 1, block_b), lambda l, k, b: (l, k, 0, b),
                     memory_space=pltpu.VMEM),                    # radius
        pl.BlockSpec((1, 1, 1, block_b), lambda l, k, b: (l, k, 0, b),
                     memory_space=pltpu.VMEM),                    # is_cyl
        pl.BlockSpec((1, 1, 3, block_b), lambda l, k, b: (l, k, 0, b),
                     memory_space=pltpu.VMEM),                    # d0
    ]
    out_specs = [
        pl.BlockSpec((1, 1, 3, block_b), lambda l, k, b: (l, k, 0, b),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 3, block_b), lambda l, k, b: (l, k, 0, b),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, block_b), lambda l, k, b: (l, k, 0, b),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((Lk, K, 3, B), jnp.float32),
        jax.ShapeDtypeStruct((Lk, K, 3, B), jnp.float32),
        jax.ShapeDtypeStruct((Lk, K, 1, B), jnp.float32),
    ]
    pa, pb, dist = pl.pallas_call(
        functools.partial(_kernel, iters=iters, sub=sub, mxu=mxu),
        grid=grid,
        in_specs=specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(verts, R, t, p0, p1, an, radius, is_cyl, d0)
    return pa, pb, dist[:, :, 0]
