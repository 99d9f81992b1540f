"""Closest-point / distance queries, TPU-native.

Replaces PyBullet's C++ GJK mesh queries (reference simulation.py:462-484,
p.getClosestPoints) with two interchangeable link geometries:

  * CAPSULE (default): every shape is a capsule (sphere = zero-length
    capsule; cylinders capsule-approximated), queried by branchless clamped
    closed forms — ~1 cm distance-error band vs the meshes, fastest.
  * HULL (robot_obstacle_distances_hull): links are decimated convex hulls
    of the actual reference meshes, solved by batched simplex GJK
    (ops/gjk.py). Accuracy, BANDED (claims like "sub-mm" hold at the
    mean/p99, not the max — reports/collision_mesh_error_hull.json):
    the GJK solver itself vs an exact hull oracle is mean 10 um / p99
    0.12 mm / max 1.1 mm; hull-vs-true-mesh obstacle-distance error is
    mean 0.1 mm / overestimate p99 0.8 mm / max 1.3 cm over, 6.3 cm
    under (decimation fidelity); the TPU rollout path's temporal warm
    start adds its own banded error, certified at the rollout level PER
    TRAJECTORY CLASS in reports/gjk_warm_accuracy.json (r5 probe, incl.
    direct policy impact |qdd_warm - qdd_cold|): the slow flagship at
    the global 4-iter warm default holds sub-mm median-tick p99 with
    qdd p99 ~4% of the cold policy's RMS; FAST-MOTION randomized scenes
    at 4 iters leave 27.5 mm close-band p99 (qdd p99 29% of RMS), so
    franka/randomized_cluttered and dual_panda/randomized_clutter pin
    Env.hull_warm_iters=8 (1.4 mm / 0.7%).
    ~6x the end-to-end rollout cost of the capsule mode, still well
    above 1M steps/s/chip.

Every query returns the same tuple PyBullet does: (point on link surface,
point on obstacle surface, normal on obstacle pointing toward the link,
signed distance). All functions are branchless, broadcast over leading
batch axes, and differentiable: the capsule queries natively, the HULL/GJK
queries via ops/gjk.support_hull's explicit envelope custom_jvp (exact a.e.
distance derivatives on every platform; validated vs finite differences in
tests/test_gjk.py). The fused Pallas GJK kernel
(robot_obstacle_distances_hull_batched) carries the same envelope rule as
a custom_vjp on its witness outputs (ops/pallas_gjk._gjk_bwd), so
reverse-mode consumers — gain tuning, neural training — run on the fused
kernel; only forward-mode (jvp) through the kernel is unsupported.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from rmp_tpu.models.urdf import KinematicModel
from rmp_tpu.ops import geom

Array = jax.Array
_EPS = 1e-9


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ObstacleSet:
    """Struct-of-arrays obstacle collection, world frame.

    p0, p1: (K, 3) segment endpoints (equal for spheres); radius: (K,).
    A pytree — poses/sizes are traced values, so scenes randomize without
    recompilation; K is static.

    kinds: optional STATIC per-obstacle shape tags ('capsule' | 'cylinder'),
    pytree aux data. The capsule queries ignore them (every shape is
    treated as a capsule, the reference-era approximation); the exact GJK
    hull mode uses them to give cylinders their true FLAT caps
    (ops/gjk.support_cylinder). None means all-capsule.
    """

    p0: Array
    p1: Array
    radius: Array
    kinds: tuple[str, ...] | None = None

    def tree_flatten(self):
        return (self.p0, self.p1, self.radius), self.kinds

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, kinds=aux)

    @property
    def count(self) -> int:
        return self.p0.shape[-2]

    @staticmethod
    def of(*obstacles: "ObstacleSet") -> "ObstacleSet":
        kinds = None
        if any(o.kinds is not None for o in obstacles):
            kinds = sum((o.kinds if o.kinds is not None
                         else ("capsule",) * o.count for o in obstacles), ())
        return ObstacleSet(
            p0=jnp.concatenate([o.p0 for o in obstacles], axis=-2),
            p1=jnp.concatenate([o.p1 for o in obstacles], axis=-2),
            radius=jnp.concatenate([o.radius for o in obstacles], axis=-1),
            kinds=kinds)


def pad_obstacles(obstacles: ObstacleSet, capacity: int,
                  far: float = 50.0) -> ObstacleSet:
    """Pad an obstacle set to a fixed CAPACITY with inert far-away
    obstacles, so scenes with different obstacle counts share one compiled
    program — the reference Datamanager's no-retrace property
    (/root/reference/data_management.py:8-17, shape-[None] tf.Variables)
    re-created the static-shape way: K is always `capacity`, and the pad
    rows sit ~`far` meters out where every obstacle policy's metric is
    EXACTLY zero (metric_modulation_radius 0.5 m, policies/v2.py), the
    capsule/GJK queries stay well-conditioned (a real short segment, not a
    degenerate point), and the broad phase never selects them while any
    real obstacle is nearer.

    Padding uses the set's own kind when uniform ('capsule' otherwise):
    `kinds` is STATIC pytree aux, so two padded sets only hit the same jit
    cache entry when their full kind tuples match — uniform sets (the
    randomizers') always do. Works on unbatched (K, ...) leaves; apply
    inside per-env reset (vmap broadcasts it)."""
    K = obstacles.count
    if capacity < K:
        raise ValueError(f"capacity {capacity} < obstacle count {K}")
    if capacity == K:
        return obstacles
    pad = capacity - K
    p0_pad = jnp.broadcast_to(jnp.asarray([far, far, far], jnp.float32),
                              (pad, 3))
    p1_pad = jnp.broadcast_to(
        jnp.asarray([far, far, far + 0.1], jnp.float32), (pad, 3))
    kinds = obstacles.kinds
    if kinds is not None:
        pad_kind = kinds[0] if len(set(kinds)) == 1 else "capsule"
        kinds = kinds + (pad_kind,) * pad
    return ObstacleSet(
        p0=jnp.concatenate([obstacles.p0, p0_pad], axis=-2),
        p1=jnp.concatenate([obstacles.p1, p1_pad], axis=-2),
        radius=jnp.concatenate(
            [obstacles.radius, jnp.full(pad, 0.01, jnp.float32)], axis=-1),
        kinds=kinds)


def sphere_obstacle(center, radius) -> ObstacleSet:
    c = jnp.asarray(center, jnp.float32)[None]
    return ObstacleSet(c, c, jnp.asarray([radius], jnp.float32))


def cylinder_obstacle(base_position, base_orientation_euler, radius,
                      height) -> ObstacleSet:
    """Cylinder (URDF/PyBullet convention: axis = local z, centered), capsule
    p0/p1/radius parameterization + kind tag.  The capsule queries round the
    caps; the GJK hull mode models them flat (exact).
    base_orientation_euler: extrinsic-XYZ (the reference passes eulers to
    PyBullet, simulation.py:245-272)."""
    c = jnp.asarray(base_position, jnp.float32)
    R = geom.rotation_matrix_from_rpy(jnp.asarray(base_orientation_euler,
                                                  jnp.float32))
    half = (height / 2.0) * R[:, 2]
    return ObstacleSet((c - half)[None], (c + half)[None],
                       jnp.asarray([radius], jnp.float32),
                       kinds=("cylinder",))


def segment_closest_params(a0: Array, a1: Array, b0: Array, b1: Array):
    """Clamped closest-point parameters (s, t) in [0,1] between segments
    a0+s(a1-a0) and b0+t(b1-b0). Branchless (Ericson 5.1.9 style, two-pass
    clamp), safe for degenerate (point) segments."""
    d1 = a1 - a0
    d2 = b1 - b0
    r = a0 - b0
    a = jnp.sum(d1 * d1, axis=-1)
    e = jnp.sum(d2 * d2, axis=-1)
    f = jnp.sum(d2 * r, axis=-1)
    c = jnp.sum(d1 * r, axis=-1)
    b = jnp.sum(d1 * d2, axis=-1)
    denom = a * e - b * b
    s = jnp.where(denom > _EPS, (b * f - c * e) / (denom + _EPS), 0.0)
    # segment B degenerate (sphere): closest point on A to the point b0
    s = jnp.where(e > _EPS, s, -c / (a + _EPS))
    s = jnp.clip(s, 0.0, 1.0)
    t = jnp.where(e > _EPS, (b * s + f) / (e + _EPS), 0.0)
    t_cl = jnp.clip(t, 0.0, 1.0)
    # re-project s for clamped t
    s = jnp.where((t != t_cl) & (a > _EPS),
                  jnp.clip((t_cl * b - c) / (a + _EPS), 0.0, 1.0), s)
    return s, t_cl


def capsule_capsule_query(a0, a1, ra, b0, b1, rb):
    """(pos_on_a, pos_on_b, normal_on_b, distance) between two capsules.

    normal_on_b points from capsule b toward capsule a (PyBullet's
    contactNormalOnB convention); distance is negative on penetration.
    Broadcasts over leading axes.
    """
    s, t = segment_closest_params(a0, a1, b0, b1)
    ca = a0 + s[..., None] * (a1 - a0)
    cb = b0 + t[..., None] * (b1 - b0)
    diff = ca - cb
    center_dist = jnp.linalg.norm(diff, axis=-1)
    n = diff / (center_dist[..., None] + _EPS)
    pos_on_a = ca - ra[..., None] * n
    pos_on_b = cb + rb[..., None] * n
    distance = center_dist - ra - rb
    return pos_on_a, pos_on_b, n, distance


def link_world_capsules(model: KinematicModel, T_all: Array):
    """World-frame (p0, p1, radius) of the first collision primitive of each
    collision frame.  T_all: (F, 4, 4) from fk_all.  Returns (L,3),(L,3),(L,)
    with L = len(model.collision_frames) (static)."""
    import numpy as np
    frames = model.collision_frames
    p0_local = np.asarray([model.collision[i][0].p0 for i in frames],
                          dtype=np.float32)
    p1_local = np.asarray([model.collision[i][0].p1 for i in frames],
                          dtype=np.float32)
    radius = jnp.asarray([model.collision[i][0].radius for i in frames],
                         dtype=jnp.float32)
    T = T_all[jnp.asarray(frames)]                    # (L, 4, 4)
    p0 = geom.transform_point(T, jnp.asarray(p0_local))
    p1 = geom.transform_point(T, jnp.asarray(p1_local))
    return p0, p1, radius


def link_world_capsules_all(model: KinematicModel, T_all: Array):
    """World-frame capsules of EVERY collision primitive (multi-primitive
    links supported).  Returns (p0 (P,3), p1 (P,3), radius (P,), frame_rows)
    where frame_rows[i] gives the collision-frame ROW (index into
    model.collision_frames) owning primitive i (static tuple)."""
    import numpy as np
    frames = model.collision_frames
    p0_local, p1_local, radii, rows, owners = [], [], [], [], []
    for row, f in enumerate(frames):
        for prim in model.collision[f]:
            p0_local.append(prim.p0)
            p1_local.append(prim.p1)
            radii.append(prim.radius)
            rows.append(row)
            owners.append(f)
    T = T_all[jnp.asarray(owners)]                    # (P, 4, 4)
    p0 = geom.transform_point(T, jnp.asarray(np.asarray(p0_local, np.float32)))
    p1 = geom.transform_point(T, jnp.asarray(np.asarray(p1_local, np.float32)))
    return p0, p1, jnp.asarray(radii, jnp.float32), tuple(rows)


def robot_obstacle_distances(model: KinematicModel, T_all: Array,
                             obstacles: ObstacleSet):
    """All link x obstacle closest-point queries.

    Returns (pos_on_link, pos_on_obstacle, normal, distance) with shapes
    (L, K, 3) / (L, K, 3) / (L, K, 3) / (L, K) — the fixed-capacity
    replacement for the reference's per-tick Python pair loop
    (simulation.py:443-484) + Datamanager variable mutation.

    Multi-primitive links are supported: the query runs over every collision
    primitive and keeps, per (frame, obstacle), the CLOSEST primitive's
    result — mirroring PyBullet's single closest point per link pair
    (simulation.py:467-472).
    """
    p0, p1, radius, rows = link_world_capsules_all(model, T_all)  # (P, ...)
    P, K = p0.shape[0], obstacles.count
    L = len(model.collision_frames)
    a0 = p0[:, None, :].repeat(K, 1)
    a1 = p1[:, None, :].repeat(K, 1)
    ra = radius[:, None].repeat(K, 1)
    b0 = jnp.broadcast_to(obstacles.p0[None], (P, K, 3))
    b1 = jnp.broadcast_to(obstacles.p1[None], (P, K, 3))
    rb = jnp.broadcast_to(obstacles.radius[None], (P, K))
    pos_l, pos_o, n, d = capsule_capsule_query(a0, a1, ra, b0, b1, rb)
    if P == L:                       # one primitive per frame: no reduction
        return pos_l, pos_o, n, d
    # closest-primitive reduction as trace-time-unrolled pairwise selects.
    # Measured alternatives on the flagship rollout (v5e, 4096 envs):
    # argmin + take_along_axis gathers: ~6x SLOWER; padded uniform-axis
    # min + one-hot einsum contraction: ~20% slower. The where-chain costs
    # ~10% vs single-capsule links — the price of mesh-fitted geometry.
    out_pl, out_po, out_n, out_d = [], [], [], []
    for row in range(L):
        idx = [i for i, r in enumerate(rows) if r == row]
        bpl, bpo, bn, bd = pos_l[idx[0]], pos_o[idx[0]], n[idx[0]], d[idx[0]]
        for i in idx[1:]:
            closer = d[i] < bd                        # (K,)
            c3 = closer[:, None]
            bpl = jnp.where(c3, pos_l[i], bpl)
            bpo = jnp.where(c3, pos_o[i], bpo)
            bn = jnp.where(c3, n[i], bn)
            bd = jnp.where(closer, d[i], bd)
        out_pl.append(bpl); out_po.append(bpo)
        out_n.append(bn); out_d.append(bd)
    return (jnp.stack(out_pl), jnp.stack(out_po), jnp.stack(out_n),
            jnp.stack(out_d))


def robot_obstacle_distances_hull(model: KinematicModel, T_all: Array,
                                  obstacles: ObstacleSet,
                                  hull_verts: Array | None = None,
                                  iters: int = 10):
    """Exact convex-hull closest-point queries (the GJK collision mode).

    Same contract as robot_obstacle_distances — (pos_on_link,
    pos_on_obstacle, normal, distance), shapes (L, K, ...) — but each link
    is its MESH CONVEX HULL (models/hulls.py; what PyBullet's GJK actually
    queries for these robots, reference simulation.py:462-484) instead of
    the fitted capsule set. Solved by branchless support-point descent
    (ops/gjk.py) batched over every (link, obstacle) pair.

    Hybrid near contact: where the hull query reports <=0.5 mm clearance
    (touching or penetrating — the regime where the descent's normal
    degenerates) the capsule result is used instead, which also supplies
    PyBullet-style penetration depths. NOTE the handoff is a step, not a
    blend: a pair crossing the 0.5 mm band jumps from hull to capsule
    values, and the jump magnitude is bounded by the CAPSULE-FIT error
    (~1 cm worst case, reports/collision_mesh_error.json) — not by the
    band width. No policy chatter has been observed (repulsion saturates
    well before 0.5 mm); if it ever is, lerp the two results over a 0-2 mm
    band here.
    """
    from rmp_tpu.ops import gjk

    if hull_verts is None:
        from rmp_tpu.models.hulls import hulls_for
        hull_verts = hulls_for(model)
        if hull_verts is None:
            raise ValueError(
                f"no hull asset for robot {model.name!r}; run "
                "experiments/fit_hulls.py or use capsule collision")
    cap_pl, cap_po, cap_n, cap_d = robot_obstacle_distances(
        model, T_all, obstacles)

    frames = jnp.asarray(model.collision_frames)
    T = T_all[frames]                                     # (L, 4, 4)
    local = jnp.asarray(hull_verts)                       # (L, V, 3) STATIC
    R = T[:, :3, :3]
    t = T[:, :3, 3]

    L, K = local.shape[0], obstacles.count
    b0 = jnp.broadcast_to(obstacles.p0[None], (L, K, 3))
    b1 = jnp.broadcast_to(obstacles.p1[None], (L, K, 3))
    rb = jnp.broadcast_to(obstacles.radius[None], (L, K))

    Rt = jnp.swapaxes(R, -1, -2)

    def sup_link(d):
        # support in LINK-LOCAL frame: the vertex table stays a compile-time
        # constant (the world-frame formulation re-reads a per-env
        # (L, V, 3) tensor every GJK iteration); two extra tiny rotations
        # per pair are the entire cost of the change. geom.mv keeps them on
        # the VPU — einsum lowered them to latency-bound tiny MXU dots
        # (12x regression).
        d_loc = geom.mv(Rt[:, None], d)                   # R^T d, (L, K, 3)
        s_loc = gjk.support_hull(local[:, None], d_loc)   # (L, K, 3)
        return geom.mv(R[:, None], s_loc) + t[:, None]

    if (obstacles.kinds is not None
            and any(k == "cylinder" for k in obstacles.kinds)):
        # exact flat caps for cylinder-tagged obstacles (the reference's
        # PyBullet cylinders); static per-obstacle select. Unit axis is
        # precomputed once — not per GJK iteration.
        is_cyl = jnp.asarray([k == "cylinder" for k in obstacles.kinds])
        an = (b1 - b0) / (jnp.linalg.norm(b1 - b0, axis=-1,
                                          keepdims=True) + 1e-12)

        def sup_obs(d):
            return jnp.where(is_cyl[None, :, None],
                             gjk.support_cylinder_unit(b0, b1, an, rb, d),
                             gjk.support_capsule(b0, b1, rb, d))
    else:
        sup_obs = lambda d: gjk.support_capsule(b0, b1, rb, d)
    # WARM START from the capsule witnesses: cap_po - cap_pl is within
    # capsule-fit error (~1 cm) of the true separating direction, vs the
    # centroid-difference guess which can be almost orthogonal to it for
    # long links — GJK then converges in ~half the iterations at the same
    # accuracy (reports/collision_mesh_error_hull.json). Degenerate
    # (penetrating/touching capsule) witnesses fall back to the centroid
    # difference; those pairs take the capsule hybrid result anyway.
    centroid = geom.mv(R, jnp.mean(local, axis=-2)) + t   # (L, 3)
    d0_centroid = (obstacles.p0 + obstacles.p1)[None] / 2 - centroid[:, None]
    d0_cap = cap_po - cap_pl
    degenerate = jnp.sum(d0_cap * d0_cap, axis=-1, keepdims=True) < 1e-8
    d0 = jnp.where(degenerate, d0_centroid, d0_cap)
    pl, po, n, dist, _gap = gjk.closest_points(sup_link, sup_obs, d0,
                                               iters=iters)

    # fallback ONLY on hull contact (capsule-only penetration readings are
    # capsule bulge false-positives the exact hulls are here to remove)
    near = dist <= 5e-4
    n3 = near[..., None]
    return (jnp.where(n3, cap_pl, pl), jnp.where(n3, cap_po, po),
            jnp.where(n3, cap_n, n),
            jnp.where(near, jnp.minimum(cap_d, dist), dist))


def robot_obstacle_distances_hull_batched(model: KinematicModel,
                                          T_all_b: Array,
                                          obstacles_b: ObstacleSet,
                                          hull_verts: Array | None = None,
                                          iters: int = 10,
                                          interpret: bool = False,
                                          top_m: int | None = None,
                                          warm: Array | None = None):
    """Batched-environment hull query via the FUSED Pallas GJK kernel
    (ops/pallas_gjk.py) — same contract and hybrid near-contact handoff as
    robot_obstacle_distances_hull with a leading env axis on every array:
    T_all_b (B, F, 4, 4), obstacle leaves (B, K, ...), outputs (B, L, K,
    ...). B must be a multiple of 128.

    The XLA scan lowering of the per-env query round-trips the simplex
    carries + Johnson intermediates through HBM every iteration (~15
    fusions x 10 iterations, latency-bound at 5% of HBM peak); the kernel
    keeps the whole descent in VMEM with the vertex table as a per-link
    grid block. Used by the fused batched rollout path; per-env and CPU
    paths keep the XLA implementation (the semantics oracle,
    tests/test_pallas_gjk.py).

    BROAD PHASE (top_m, default 3 / RMP_GJK_TOPM): per (env, link), only
    the top_m obstacles NEAREST by capsule distance run exact GJK — kernel
    cost scales with L*top_m instead of L*K. Every other pair returns its
    capsule result. That is exact for the policy consumer whenever at most
    top_m obstacles sit within the obstacle policy's support
    (metric_modulation_radius 0.5 m, policies/v2.py — the metric is
    EXACTLY zero beyond it); a (top_m+1)-th obstacle inside the support
    degrades gracefully to the capsule distance (|err| bounded by the
    ~1 cm mesh-fit bulge). top_m >= K disables compaction.

    TEMPORAL WARM START (warm): optional (B, L, K, 3) witness directions
    from the previous tick (the 5th return value). Between control ticks
    the scene moves ~mm, so the previous witness direction is a
    near-converged start — rollouts carry it and run iters ~4 instead of
    10 (incremental GJK). Pairs with |warm| ~ 0 (fresh/reset) fall back
    to the capsule-witness start. Returns a 5-tuple
    (pos_on_link, pos_on_obstacle, normal, distance, warm_next).
    """
    from rmp_tpu.ops.pallas_gjk import gjk_hull_obstacles

    if hull_verts is None:
        from rmp_tpu.models.hulls import hulls_for
        hull_verts = hulls_for(model)
        if hull_verts is None:
            raise ValueError(
                f"no hull asset for robot {model.name!r}; run "
                "experiments/fit_hulls.py or use capsule collision")
    cap_pl, cap_po, cap_n, cap_d = jax.vmap(
        lambda T, o: robot_obstacle_distances(model, T, o))(
            T_all_b, obstacles_b)                         # (B, L, K, ...)

    frames = jnp.asarray(model.collision_frames)
    T = T_all_b[:, frames]                                # (B, L, 4, 4)
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    local = jnp.asarray(hull_verts)                       # (L, V, 3)

    p0, p1, rb = obstacles_b.p0, obstacles_b.p1, obstacles_b.radius
    axis = p1 - p0
    an = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + 1e-12)
    kinds = obstacles_b.kinds
    K_obs = p0.shape[1]
    is_cyl = (jnp.asarray([k == "cylinder" for k in kinds], jnp.float32)
              if kinds is not None else jnp.zeros(K_obs, jnp.float32))

    # warm start from capsule witnesses (see robot_obstacle_distances_hull)
    centroid = geom.mv(R, jnp.mean(local, axis=-2)[None]) + t  # (B, L, 3)
    d0_centroid = ((p0 + p1) / 2)[:, None] - centroid[:, :, None]
    d0_cap = cap_po - cap_pl
    degenerate = jnp.sum(d0_cap * d0_cap, axis=-1, keepdims=True) < 1e-8
    d0 = jnp.where(degenerate, d0_centroid, d0_cap)       # (B, L, K, 3)
    if warm is not None:
        live = jnp.sum(warm * warm, axis=-1, keepdims=True) > 1e-10
        # STALENESS GUARD (r5, ships OFF — measured no benefit): the
        # hypothesis was that fast-motion envs (randomized_cluttered
        # transits at ~10x the flagship's joint velocity) leave the carry
        # directionally stale; falling back to the fresh capsule witness
        # when carry and capsule witness disagree by >25 deg measured
        # IDENTICAL banded error (close-band p99 30 mm vs 28 mm,
        # reports/gjk_warm_accuracy.json r5 probe) — the residual error on
        # randomized scenes is ITERATION-COUNT-limited (penetrating spawn
        # transients + fatter cylinders need more descent steps from ANY
        # start), not staleness-limited; raise RMP_GJK_ITERS there
        # instead. Knob kept as the documented negative result.
        import os
        stale_cos = float(os.environ.get("RMP_GJK_STALE_COS", "0.0"))
        if stale_cos > 0.0:
            wn = warm * jax.lax.rsqrt(
                jnp.sum(warm * warm, axis=-1, keepdims=True) + 1e-12)
            cn = d0 * jax.lax.rsqrt(
                jnp.sum(d0 * d0, axis=-1, keepdims=True) + 1e-12)
            aligned = jnp.sum(wn * cn, axis=-1,
                              keepdims=True) > stale_cos
            live = live & aligned
        d0 = jnp.where(live, warm, d0)

    B = T_all_b.shape[0]
    Lk = len(model.collision_frames)
    if top_m is None:
        import os
        top_m = int(os.environ.get("RMP_GJK_TOPM", "3"))
    M = min(top_m, K_obs)

    if M < K_obs:
        # broad phase: top-M nearest obstacles per (env, link) by capsule
        # distance — where-chain min + first-true one-hot (argmin/
        # take_along_axis gathers measured 6x slower on this chip,
        # CLAUDE.md dead-ends)
        taken = jnp.zeros(cap_d.shape, bool)              # (B, L, K)
        hots = []
        for _ in range(M):
            dm = jnp.where(taken, jnp.inf, cap_d)
            best = dm[..., 0]
            for k in range(1, K_obs):
                best = jnp.minimum(best, dm[..., k])
            hit = dm <= best[..., None]
            prev = jnp.zeros(hit.shape[:-1], bool)
            firsts = []
            for k in range(K_obs):
                firsts.append(hit[..., k] & ~prev)
                prev = prev | hit[..., k]
            first = jnp.stack(firsts, axis=-1)            # exclusive
            hots.append(first)
            taken = taken | first
        hot = jnp.stack(hots).astype(cap_d.dtype)         # (M, B, L, K)

        def take_obs(v):                                  # (B, K, C) ->
            out = (hot[..., None] * v[None, :, None]).sum(axis=3)
            return jnp.transpose(out, (2, 0, 3, 1))       # (L, M, C, B)

        p0_k = take_obs(p0)
        p1_k = take_obs(p1)
        an_k = take_obs(an)
        r_k = take_obs(rb[..., None])                     # (L, M, 1, B)
        cyl_k = take_obs(jnp.broadcast_to(is_cyl[None, :, None],
                                          (B, K_obs, 1)))
        d0_k = jnp.transpose((hot[..., None] * d0[None]).sum(axis=3),
                             (2, 0, 3, 1))                # (L, M, 3, B)
    else:
        def bcast(v):                                     # (K, C, B) ->
            return jnp.broadcast_to(v[None], (Lk,) + v.shape)

        p0_k = bcast(jnp.transpose(p0, (1, 2, 0)))
        p1_k = bcast(jnp.transpose(p1, (1, 2, 0)))
        an_k = bcast(jnp.transpose(an, (1, 2, 0)))
        r_k = bcast(jnp.transpose(rb, (1, 0))[:, None])
        cyl_k = bcast(jnp.broadcast_to(is_cyl[:, None, None],
                                       (K_obs, 1, B)))
        d0_k = jnp.transpose(d0, (1, 2, 3, 0))            # (L, K, 3, B)

    pa_k, pb_k, dist_k = gjk_hull_obstacles(
        local,
        jnp.transpose(R, (1, 2, 3, 0)),                   # (L, 3, 3, B)
        jnp.transpose(t, (1, 2, 0)),                      # (L, 3, B)
        p0_k, p1_k, an_k, r_k, cyl_k, d0_k,
        iters=iters, interpret=interpret)

    if M < K_obs:
        # scatter the M exact results back into (B, L, K); unselected
        # pairs keep their capsule witnesses/distance (weight 0 beyond
        # the 0.5 m metric support)
        pa_c = jnp.transpose(pa_k, (3, 0, 1, 2))          # (B, L, M, 3)
        pb_c = jnp.transpose(pb_k, (3, 0, 1, 2))
        dist_c = jnp.transpose(dist_k, (2, 0, 1))         # (B, L, M)
        hot_blkm = jnp.transpose(hot, (1, 2, 3, 0))       # (B, L, K, M)
        dist = (hot_blkm * dist_c[:, :, None]).sum(-1)
        pa = (hot_blkm[..., None] * pa_c[:, :, None]).sum(3)
        pb = (hot_blkm[..., None] * pb_c[:, :, None]).sum(3)
        sel = taken
        s3 = sel[..., None]
        dist = jnp.where(sel, dist, cap_d)
        pa = jnp.where(s3, pa, cap_pl)
        pb = jnp.where(s3, pb, cap_po)
        n = (pa - pb) / (dist[..., None] + 1e-9)
        n = jnp.where(s3, n, cap_n)
        near = sel & (dist <= 5e-4)
    else:
        pa = jnp.transpose(pa_k, (3, 0, 1, 2))            # (B, L, K, 3)
        pb = jnp.transpose(pb_k, (3, 0, 1, 2))
        dist = jnp.transpose(dist_k, (2, 0, 1))           # (B, L, K)
        n = (pa - pb) / (dist[..., None] + 1e-9)
        near = dist <= 5e-4
    n3 = near[..., None]
    out_pa = jnp.where(n3, cap_pl, pa)
    out_pb = jnp.where(n3, cap_po, pb)
    # next-tick warm start: obstacle-minus-link witness direction (same
    # convention as d0_cap above); unselected/near pairs carry the capsule
    # direction, which is exactly the cold-start fallback
    warm_next = out_pb - out_pa
    return (out_pa, out_pb, jnp.where(n3, cap_n, n),
            jnp.where(near, jnp.minimum(cap_d, dist), dist), warm_next)


def robot_self_distances_hull(model: KinematicModel, T_all: Array,
                              pairs: tuple[tuple[int, int], ...],
                              hull_verts: Array | None = None,
                              iters: int = 10):
    """Hull-vs-hull closest-point queries for static frame pairs — the
    exact-geometry counterpart of robot_self_distances (same return tuple,
    leading axis len(pairs)), solved by batched simplex GJK with both
    supports evaluated in their link-local frames (static vertex tables).

    Hybrid near contact (<=0.5 mm or hull overlap): the capsule result
    supplies the penetration-depth surrogate and a stable normal."""
    from rmp_tpu.ops import gjk

    if hull_verts is None:
        from rmp_tpu.models.hulls import hulls_for
        hull_verts = hulls_for(model)
        if hull_verts is None:
            raise ValueError(
                f"no hull asset for robot {model.name!r}; run "
                "experiments/fit_hulls.py or use capsule collision")
    cap_pl, cap_po, cap_n, cap_d = robot_self_distances(model, T_all, pairs)

    import numpy as np
    local = np.asarray(hull_verts)                        # (L, V, 3)
    row = {f: i for i, f in enumerate(model.collision_frames)}
    la = jnp.asarray(local[[row[a] for a, _ in pairs]])   # (P, V, 3) static
    lb = jnp.asarray(local[[row[b] for _, b in pairs]])
    Ta = T_all[jnp.asarray([a for a, _ in pairs])]        # (P, 4, 4)
    Tb = T_all[jnp.asarray([b for _, b in pairs])]

    def posed_support(loc, T):
        R, t = T[..., :3, :3], T[..., :3, 3]
        Rt = jnp.swapaxes(R, -1, -2)

        def sup(d):
            s_loc = gjk.support_hull(loc, geom.mv(Rt, d))
            return geom.mv(R, s_loc) + t
        return sup

    sup_a = posed_support(la, Ta)
    sup_b = posed_support(lb, Tb)
    ca = geom.mv(Ta[..., :3, :3], jnp.mean(la, axis=-2)) + Ta[..., :3, 3]
    cb = geom.mv(Tb[..., :3, :3], jnp.mean(lb, axis=-2)) + Tb[..., :3, 3]
    # capsule-witness warm start (see robot_obstacle_distances_hull)
    d0_cap = cap_po - cap_pl
    degenerate = jnp.sum(d0_cap * d0_cap, axis=-1, keepdims=True) < 1e-8
    d0 = jnp.where(degenerate, cb - ca, d0_cap)
    pl, po, n, dist, _gap = gjk.closest_points(sup_a, sup_b, d0,
                                               iters=iters)

    near = dist <= 5e-4
    n3 = near[..., None]
    return (jnp.where(n3, cap_pl, pl), jnp.where(n3, cap_po, po),
            jnp.where(n3, cap_n, n),
            jnp.where(near, jnp.minimum(cap_d, dist), dist))


def self_collision_pairs(model: KinematicModel, n_neighbors: int = 3,
                         exclude_below: float | None = None,
                         q_ref=None):
    """Static list of (frame_a, frame_b) collision-frame pairs at least
    n_neighbors apart in the kinematic tree — the reference builds (but
    disables) the same todo-list via PyBullet (simulation.py:411-441; its
    check_link_neighborhood also walks ancestors only, so sibling links
    like the two fingers are NOT tree-excluded).

    exclude_below (+ q_ref): additionally drop pairs whose capsule distance
    at the reference pose is already below the threshold — structurally
    adjacent geometry (the fingers, hand-vs-wrist) that would otherwise
    exert a constant repulsion bias on avoidance policies. Same idea as a
    MoveIt SRDF 'disable adjacent/default-colliding pairs' pass."""
    frames = model.collision_frames
    pairs = []
    for a in frames:
        for b in frames:
            if a == b:
                continue
            chain_a, chain_b = model.chain(a), model.chain(b)
            if a in chain_b[-n_neighbors - 1:] or b in chain_a[-n_neighbors - 1:]:
                continue
            if (b, a) in pairs:
                continue
            pairs.append((a, b))
    if exclude_below is not None:
        import numpy as np

        from rmp_tpu.models import kinematics as K
        q_ref = jnp.zeros(model.n_q) if q_ref is None else jnp.asarray(q_ref)
        T_all = K.fk_all(model, q_ref)
        _, _, _, d = robot_self_distances(model, T_all, tuple(pairs))
        d = np.asarray(d)
        pairs = [p for p, dd in zip(pairs, d) if dd >= exclude_below]
    return tuple(pairs)


def robot_self_distances(model: KinematicModel, T_all: Array,
                         pairs: tuple[tuple[int, int], ...]):
    """Closest-point queries between the capsule SETS of static frame pairs
    (multi-primitive links: min over the primitive cross product per pair,
    matching PyBullet's closest point per link pair).

    Returns the same tuple layout as robot_obstacle_distances with leading
    axis len(pairs).  (Self-avoidance capability — the reference's version
    is bitrotted/disabled, simulation.py:406-408.)"""
    import numpy as np
    p0, p1, radius, rows = link_world_capsules_all(model, T_all)
    frames = model.collision_frames
    pos = {f: i for i, f in enumerate(frames)}
    groups: dict[int, list[int]] = {}
    for i, r in enumerate(rows):
        groups.setdefault(r, []).append(i)
    combos = [[(i, j) for i in groups[pos[a]] for j in groups[pos[b]]]
              for a, b in pairs]
    C = max(len(cs) for cs in combos)
    IA = np.zeros((len(pairs), C), np.int32)
    IB = np.zeros((len(pairs), C), np.int32)
    for k, cs in enumerate(combos):            # pad by repeating (harmless
        for c in range(C):                     # under the min-reduction)
            IA[k, c], IB[k, c] = cs[min(c, len(cs) - 1)]
    # constant-index gathers (compile-time reshuffles — cheap, unlike the
    # runtime take_along_axis gathers banned from hot graphs)
    pl, po, n, d = capsule_capsule_query(p0[IA], p1[IA], radius[IA],
                                         p0[IB], p1[IB], radius[IB])
    bpl, bpo, bn, bd = pl[:, 0], po[:, 0], n[:, 0], d[:, 0]
    for c in range(1, C):
        closer = d[:, c] < bd
        c3 = closer[:, None]
        bpl = jnp.where(c3, pl[:, c], bpl)
        bpo = jnp.where(c3, po[:, c], bpo)
        bn = jnp.where(c3, n[:, c], bn)
        bd = jnp.where(closer, d[:, c], bd)
    return bpl, bpo, bn, bd
