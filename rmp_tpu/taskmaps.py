"""Taskmap algebra — composable differentiable maps from configuration space.

A taskmap here is a *pure function* ``fn(v, ctx) -> x`` where the first map in
a chain receives ``q`` (n_q,) and every map outputs a row-batched task-space
array ``x: (P, d)`` (P = number of parallel instances, e.g. obstacle pairs;
P = 1 for simple maps).  ``ctx`` is the policy's per-tick context pytree
(obstacle points, relative offsets, ...), replacing the reference's mutable
``tf.Variable`` closures (data_management.py:8-17) with functional inputs —
no retracing, static shapes.

Chaining is plain function composition: JAX's jvp/jacfwd differentiates the
composite directly, so the reference's hand-written chain rule
(taskmap.py:142-168: J = J2 J1, c = c2 + J2 c1) disappears — it is recovered
exactly by autodiff.  Derivatives (x, ẋ, J, c) of a chained map are produced
by ``rmp_tpu.models.kinematics.differentiate`` (and in the combine engine all
policies share a single stacked jacfwd, core.py).

Capability parity with reference taskmap.py:6-168:
  identity                 <-> IdentityTaskmap           (taskmap.py:13-20)
  fk_frame                 <-> TaskmapByForwardKinematic (taskmap.py:22-31)
  from_function            <-> TaskmapByFunction         (taskmap.py:33-42)
  to_position              <-> TaskmapFrom4x4ToPosition  (taskmap.py:45-54)
  to_euler                 <-> TaskmapFrom4x4ToEuler     (taskmap.py:57-67)
  to_quaternion            <-> TaskmapFrom4x4ToQuaternions (taskmap.py:70-77,
                               a NotImplementedError stub there — implemented
                               here)
  relative_offsets         <-> TaskmapRelative4x4        (taskmap.py:79-99)
  frame_to_point_distance  <-> TaskmapJointFrame4x4ToDistance
                               (taskmap.py:115-138, incl. the stop_gradient
                               frozen-offset trick at taskmap.py:126)
  chain                    <-> chain_taskmaps            (taskmap.py:142-168)
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from rmp_tpu.models import kinematics
from rmp_tpu.models.urdf import KinematicModel
from rmp_tpu.ops import geom

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class Taskmap:
    """A taskmap: callable (q, ctx) -> x (P, d).

    FK-rooted taskmaps additionally expose (model, frame_idx, post) so the
    combine engine can compute `fk_all` ONCE per evaluation and feed every
    policy's downstream map from the shared frame transforms (the reference
    re-runs the whole FK graph per policy per tick, rmp.py:142-159) —
    `post(T16 (1,16), ctx) -> (P, d)` is the part after the FK frame.
    """

    fn: Callable
    model: KinematicModel | None = None
    frame_idx: int | None = None
    post: Callable | None = None
    is_identity: bool = False
    # trans_fn: variant of fn that consumes frame TRANSLATIONS (L, 3)
    # instead of flattened 4x4s (L, 16) — declared by maps that only read
    # the translation (to_position, the distance maps). chain() folds it
    # into post_trans on the composite so the combine engine propagates
    # 3-row derivative blocks instead of 16-row ones (the (B, L, 16, n)
    # Jacobian stacks were the single largest flagship intermediate).
    trans_fn: Callable | None = None
    # post_trans(p3 (L, 3), ctx) -> (P, d): translation-space counterpart
    # of `post` on chained maps (set by chain() when the head passes frames
    # through untouched and the first tail map has trans_fn)
    post_trans: Callable | None = None
    # head maps (fk_frame / multi_fk_frames) whose post is the identity
    # frame passthrough set this so chain() knows trans folding is valid
    post_passthrough: bool = False

    def __call__(self, q, ctx=None):
        return self.fn(q, ctx)

    @property
    def fk_rooted(self) -> bool:
        return self.post is not None


# ---------------------------------------------------------------------------
# Constructors. Each returns a Taskmap whose fn maps (v, ctx) -> (P, d).
# ---------------------------------------------------------------------------


def identity() -> Taskmap:
    """q -> q, as a (1, n_q) row."""
    def fn(q, ctx):
        del ctx
        return q[None, :]
    return Taskmap(fn, is_identity=True)


def fk_frame(model: KinematicModel, frame: str | int) -> Taskmap:
    """q -> flattened world 4x4 of `frame`: (1, 16)."""
    idx = model.frame_index(frame) if isinstance(frame, str) else frame

    def fn(q, ctx):
        del ctx
        return kinematics.fk_frame(model, q, idx).reshape(1, 16)
    return Taskmap(fn, model=model, frame_idx=idx,
                   post=lambda T16, ctx: T16, post_passthrough=True)


def from_function(forward_fn) -> Taskmap:
    """Wrap an arbitrary (v, ctx) -> (P, d) map."""
    if isinstance(forward_fn, Taskmap):
        return forward_fn
    return Taskmap(forward_fn)


def multi_fk_frames(model: KinematicModel, frames) -> Taskmap:
    """q -> flattened world 4x4s of several frames at once: (L, 16).

    Lets one policy cover many frames (e.g. one obstacle-avoidance policy
    over all collision links x all obstacles) so the combine engine emits one
    fused computation instead of L near-identical per-frame graphs.
    """
    idxs = tuple(model.frame_index(f) if isinstance(f, str) else f
                 for f in frames)

    def fn(q, ctx):
        del ctx
        T_all = kinematics.fk_all(model, q)
        return jnp.stack([T_all[i] for i in idxs]).reshape(len(idxs), 16)
    return Taskmap(fn, model=model, frame_idx=idxs,
                   post=lambda T16s, ctx: T16s, post_passthrough=True)


def frames_to_point_distance(link_field: str = "pos_on_link",
                             obstacle_field: str = "pos_on_obstacle") -> Taskmap:
    """(L, 16) frames -> (L*K, 1) distances to per-(frame, pair) obstacle
    points; the grouped version of frame_to_point_distance (same frozen-offset
    trick). ctx fields are (L, K, 3) in base frame."""
    def dist(p, ctx):
        # p: (L, 3) frame translations
        pos_on_link = ctx[link_field]                 # (L, K, 3)
        pos_on_obstacle = ctx[obstacle_field]         # (L, K, 3)
        L, K, _ = pos_on_link.shape
        p_joint = jnp.broadcast_to(p[:, None, :], pos_on_link.shape)
        offset = jax.lax.stop_gradient(pos_on_link - p_joint)
        critical = p_joint + offset
        d = jnp.linalg.norm(critical - pos_on_obstacle, axis=-1)  # (L, K)
        return d.reshape(L * K, 1)

    def fn(x, ctx):
        L = ctx[link_field].shape[0]
        return dist(x.reshape(L, 4, 4)[:, :3, 3], ctx)
    return Taskmap(fn, trans_fn=dist)


def frames_relative_offsets(ctx_field: str = "relative_position") -> Taskmap:
    """(L, 16) frames -> (L*K, 16): each frame composed with its K
    pure-translation offsets from ctx[ctx_field] (L, K, 3) (frame coords);
    grouped version of relative_offsets."""
    def fn(x, ctx):
        offs = ctx[ctx_field]                         # (L, K, 3)
        L, K, _ = offs.shape
        T_ref = x.reshape(L, 1, 4, 4)
        eye = jnp.broadcast_to(jnp.eye(3, dtype=x.dtype), (L, K, 3, 3))
        T_rel = geom.hom(eye, offs)                   # (L, K, 4, 4)
        T = geom.mm(jnp.broadcast_to(T_ref, T_rel.shape), T_rel)
        return T.reshape(L * K, 16)
    return Taskmap(fn)


def to_position() -> Taskmap:
    """(P, 16) flattened 4x4 -> (P, 3) translation."""
    def fn(x, ctx):
        del ctx
        return x.reshape(-1, 4, 4)[:, :3, 3]
    return Taskmap(fn, trans_fn=lambda p, ctx: p)


def to_euler() -> Taskmap:
    """(P, 16) flattened 4x4 -> (P, 3) extrinsic-XYZ euler angles."""
    def fn(x, ctx):
        del ctx
        return geom.euler_from_rotation_matrix(x.reshape(-1, 4, 4)[:, :3, :3])
    return Taskmap(fn)


def to_quaternion() -> Taskmap:
    """(P, 16) flattened 4x4 -> (P, 4) quaternion (x, y, z, w).

    The reference stubbed this map (taskmap.py:70-77); implemented here via
    the branch-free Shepperd conversion (jit/vjp-safe away from the w=0
    surface).
    """
    def fn(x, ctx):
        del ctx
        return geom.quaternion_from_rotation_matrix(x.reshape(-1, 4, 4)[:, :3, :3])
    return Taskmap(fn)


def to_rotation6() -> Taskmap:
    """(P, 16) flattened 4x4 -> (P, 6): first two rotation columns (the
    continuous 6D rotation representation — no euler wrap or quaternion
    double-cover discontinuities; beyond the reference's taskmap set, which
    only offers euler + a stubbed quaternion map)."""
    def fn(x, ctx):
        del ctx
        R = x.reshape(-1, 4, 4)[:, :3, :3]
        return jnp.concatenate([R[:, :, 0], R[:, :, 1]], axis=-1)
    return Taskmap(fn)


def relative_offsets(ctx_field: str = "relative_position") -> Taskmap:
    """(1, 16) frame 4x4 -> (P, 16): frame composed with P pure-translation
    offsets taken from ctx[ctx_field] (P, 3) (expressed in the frame).

    Reference TaskmapRelative4x4 (taskmap.py:79-99).
    """
    def fn(x, ctx):
        offs = ctx[ctx_field]                       # (P, 3)
        T_ref = x.reshape(-1, 4, 4)                 # (1, 4, 4)
        eye = jnp.broadcast_to(jnp.eye(3, dtype=x.dtype), offs.shape[:1] + (3, 3))
        T_rel = geom.hom(eye, offs)                 # (P, 4, 4)
        T = geom.mm(jnp.broadcast_to(T_ref, T_rel.shape), T_rel)
        return T.reshape(-1, 16)
    return Taskmap(fn)


def relative_points(ctx_field: str = "relative_position") -> Taskmap:
    """(1, 16) frame 4x4 -> (P, 3): world positions of P pure-translation
    offsets expressed in the frame — the FUSED form of
    chain(relative_offsets, to_position): x = R @ off + t directly, no
    (P, 4, 4) homogeneous products (the post map is re-evaluated ~n_q+3
    times per tick by the combine engine's jvp sweeps, so the 64-multiply
    4x4 composition measured ~6% of dual-arm device time against the 9
    multiplies actually needed). Same math, bit-equal derivatives
    (test_taskmaps.test_relative_points_equals_chain)."""
    def fn(x, ctx):
        offs = ctx[ctx_field]                       # (P, 3)
        T = x.reshape(-1, 4, 4)                     # (1, 4, 4)
        R = jnp.broadcast_to(T[:, :3, :3], offs.shape[:1] + (3, 3))
        return geom.mv(R, offs) + T[:, :3, 3]
    return Taskmap(fn)


def frames_relative_points(ctx_field: str = "relative_position") -> Taskmap:
    """(L, 16) frames -> (L*K, 3): grouped version of relative_points
    (offsets ctx[ctx_field] are (L, K, 3) in each frame's coordinates)."""
    def fn(x, ctx):
        offs = ctx[ctx_field]                       # (L, K, 3)
        L, K, _ = offs.shape
        T = x.reshape(L, 1, 4, 4)
        R = jnp.broadcast_to(T[:, :, :3, :3], (L, K, 3, 3))
        p = geom.mv(R, offs) + T[:, :, :3, 3]
        return p.reshape(L * K, 3)
    return Taskmap(fn)


def frame_to_point_distance(link_field: str = "pos_on_link",
                            obstacle_field: str = "pos_on_obstacle") -> Taskmap:
    """(1, 16) frame 4x4 -> (P, 1) distances from per-pair body points to
    per-pair obstacle points.

    The body point is reconstructed as (frame origin) + stop_gradient(offset
    in base frame), so the Jacobian sees the point as rigidly attached to the
    joint frame origin — exactly the reference's frozen-offset trick
    (taskmap.py:120-131).  ctx fields are (P, 3) in base frame.
    """
    def dist(p, ctx):
        # p: (1, 3) frame translation
        pos_on_link = ctx[link_field]               # (P, 3) base frame
        pos_on_obstacle = ctx[obstacle_field]       # (P, 3) base frame
        p_joint = jnp.broadcast_to(p[:1, :], pos_on_link.shape)     # (P, 3)
        offset = jax.lax.stop_gradient(pos_on_link - p_joint)
        critical = p_joint + offset
        d = jnp.linalg.norm(critical - pos_on_obstacle, axis=-1)
        return d[:, None]

    def fn(x, ctx):
        return dist(x.reshape(-1, 4, 4)[:, :3, 3], ctx)
    return Taskmap(fn, trans_fn=dist)


def chain(*maps) -> Taskmap:
    """Compose taskmaps left-to-right: chain(f, g)(q, ctx) = g(f(q, ctx), ctx).

    Reference chain_taskmaps (taskmap.py:142-168); here composition is plain —
    autodiff of the composite reproduces J = J2 J1 and c = c2 + J2 c1.
    If the head map is FK-rooted, the chained map stays FK-rooted with the
    downstream maps folded into `post`, so the combine engine shares one
    fk_all across all policies.
    """
    maps = tuple(from_function(m) for m in maps)

    def fn(v, ctx):
        for m in maps:
            v = m.fn(v, ctx)
        return v

    head = maps[0]
    if head.fk_rooted:
        tail = maps[1:]

        def post(T16, ctx):
            v = head.post(T16, ctx)
            for m in tail:
                v = m.fn(v, ctx)
            return v

        # translation-only fold: when the head passes frames through
        # untouched and the FIRST tail map reads only translations, the
        # composite consumes (L, 3) translation rows — the combine engine
        # then propagates 3-row FK derivative blocks instead of 16-row ones
        post_trans = None
        if (head.post_passthrough and tail
                and tail[0].trans_fn is not None):
            def post_trans(p3, ctx):
                v = tail[0].trans_fn(p3, ctx)
                for m in tail[1:]:
                    v = m.fn(v, ctx)
                return v
        return Taskmap(fn, model=head.model, frame_idx=head.frame_idx,
                       post=post, post_trans=post_trans)
    return Taskmap(fn)


def differentiate(taskmap_fn, q: Array, qd: Array, ctx=None):
    """(x, ẋ, J, c) of a taskmap at (q, q̇): shapes (P,d), (P,d), (P,d,n), (P,d).

    Forward-mode throughout (see models/kinematics.differentiate).
    """
    fn = lambda qq: taskmap_fn(qq, ctx)
    return kinematics.differentiate(fn, q, qd)
