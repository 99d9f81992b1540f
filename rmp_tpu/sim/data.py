"""Per-tick distance context for collision policies.

Functional replacement for the reference's Datamanager
(data_management.py:3-53): instead of mutating per-frame tf.Variables with
dynamically-shaped PyBullet query results, the distance context is a pytree
of fixed-capacity arrays computed inside jit from the analytic collision
queries — static shapes, no retracing, vmappable over environments.

Each collision frame gets a ctx dict with the same fields Datamanager kept:
  pos_on_link          (K, 3)  base frame
  pos_on_obstacle      (K, 3)  base frame
  normal               (K, 3)  on obstacle, pointing toward the link
  distance             (K,)
  relative_position    (K, 3)  obstacle-nearest body point in the joint frame
                               (data_management.py:44-52)
  mask                 (K,)    1.0 for valid pairs (all valid here; kept for
                               padded/variable obstacle counts)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rmp_tpu.models.urdf import KinematicModel
from rmp_tpu.ops import geom
from rmp_tpu.sim.collision import ObstacleSet, robot_obstacle_distances

Array = jax.Array


PAIRS_KEY = "__pairs__"


def distance_context(model: KinematicModel, T_all: Array,
                     obstacles: ObstacleSet,
                     geometry: str = "capsule") -> dict[str, dict[str, Array]]:
    """dict frame_name -> ctx for every collision frame (static keys), plus a
    stacked entry under PAIRS_KEY with the raw (L, K, ...) arrays for grouped
    multi-frame policies (one policy over all collision links).

    geometry: 'capsule' (fitted multi-capsule links, default) or 'hull'
    (exact mesh-convex-hull GJK, sim/collision.robot_obstacle_distances_hull)."""
    if geometry == "hull":
        from rmp_tpu.sim.collision import robot_obstacle_distances_hull
        pos_on_link, pos_on_obstacle, normal, distance = \
            robot_obstacle_distances_hull(model, T_all, obstacles)
    else:
        pos_on_link, pos_on_obstacle, normal, distance = \
            robot_obstacle_distances(model, T_all, obstacles)  # (L, K, ...)
    frames = jnp.asarray(model.collision_frames)
    T = T_all[frames]                                          # (L, 4, 4)
    R_joint_base = jnp.swapaxes(T[:, :3, :3], -1, -2)
    rel = geom.mv(R_joint_base[:, None],
                  pos_on_link - T[:, None, :3, 3])             # (L, K, 3)
    mask = jnp.ones_like(distance)
    out = {PAIRS_KEY: dict(
        pos_on_link=pos_on_link, pos_on_obstacle=pos_on_obstacle,
        normal=normal, distance=distance, relative_position=rel, mask=mask)}
    for row, frame_idx in enumerate(model.collision_frames):
        out[model.frame_names[frame_idx]] = dict(
            pos_on_link=pos_on_link[row],
            pos_on_obstacle=pos_on_obstacle[row],
            normal=normal[row],
            distance=distance[row],
            relative_position=rel[row],
            mask=mask[row],
        )
    return out
