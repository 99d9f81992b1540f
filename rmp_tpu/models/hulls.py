"""Convex-hull collision geometry tables (the exact GJK collision mode).

assets/panda_hulls.npz holds, per Panda collision link, a decimated convex
hull of the reference collision mesh in collision-frame local coordinates
(fit + certified by experiments/fit_hulls.py; support error <~1 mm at 96
vertices). PyBullet itself convexifies non-VHACD mesh collision shapes, so
these hulls reproduce what the reference's GJK queries actually see
(reference simulation.py:462-484) — unlike the capsule fits, which are a
~1 cm-band approximation (models/specs._PANDA_CAPS).

`hulls_for(model)` returns a (L, V, 3) numpy vertex table aligned with
model.collision_frames, padded per link by repeating the first vertex
(harmless under the support max). Returns None when no hull asset exists
for the robot (hull collision mode is then unavailable).
"""
from __future__ import annotations

import os

import numpy as np

from rmp_tpu.models.urdf import KinematicModel

_ASSET_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          os.pardir, os.pardir, "assets")
_HULL_FILES = {"panda": "panda_hulls.npz",
               # dual-arm composition reuses the single-Panda hulls: links
               # are the same geometry under an L_/R_ prefix (specs.make_dual_spec)
               "panda_dual": "panda_hulls.npz"}
_LINK_ALIASES = {"panda_dual": lambda link: link[2:]}
_CACHE: dict[tuple, np.ndarray | None] = {}


def _two_joint_hulls() -> dict[str, np.ndarray]:
    """Exact hulls for the TwoJointRobot's PRIMITIVE collision geometry
    (reference TwoJointRobot_wo_fixedJoints.urdf): link_1/link_2 are
    1.0 x 0.1 x 0.05 boxes centered at x=0.5 (8 corners, exact); the EE
    link_23_cyl is a z-axis cylinder r=0.075, l=0.05 — a 24-gon prism
    (48 verts, 0.64 mm max chord deviation). The capsule mode rounds the
    box ends and models the EE as a sphere; hull mode matches PyBullet's
    primitives to sub-mm."""
    box = np.asarray([[x, y, z] for x in (0.0, 1.0) for y in (-0.05, 0.05)
                      for z in (-0.025, 0.025)], np.float32)
    ang = np.linspace(0.0, 2.0 * np.pi, 24, endpoint=False)
    ring = np.stack([0.075 * np.cos(ang), 0.075 * np.sin(ang)], axis=-1)
    cyl = np.concatenate([
        np.concatenate([ring, np.full((24, 1), z)], axis=-1)
        for z in (-0.025, 0.025)]).astype(np.float32)
    return {"link_1": box, "link_2": box, "link_23_cyl": cyl}


def _capsule_polytope(p0, p1, r, n_ring: int = 16) -> np.ndarray:
    """Inner polytope approximation of a capsule (segment p0->p1, radius r):
    per end — the pole plus rings at hemisphere latitudes 0/22.5/45/67.5°.
    Chord deviation <= r(1-cos(11.25°)) ~ 1.9% of r both in azimuth (16
    verts/ring) and along meridians (22.5° latitude steps): ~1.2 mm at
    r = 0.06. An INNER approximation, so hull-mode distances can only
    overestimate clearance by that bound."""
    p0 = np.asarray(p0, np.float64)
    p1 = np.asarray(p1, np.float64)
    a = p1 - p0
    norm = np.linalg.norm(a)
    a = a / norm if norm > 1e-12 else np.asarray([0.0, 0.0, 1.0])
    u = np.cross(a, [1.0, 0.0, 0.0])
    if np.linalg.norm(u) < 1e-6:
        u = np.cross(a, [0.0, 1.0, 0.0])
    u /= np.linalg.norm(u)
    v = np.cross(a, u)
    ang = np.linspace(0.0, 2.0 * np.pi, n_ring, endpoint=False)
    ring = np.outer(np.cos(ang), u) + np.outer(np.sin(ang), v)
    pts = []
    for p, sgn in ((p0, -1.0), (p1, 1.0)):
        pts.append(p + sgn * r * a)                       # pole
        for lat in (0.0, np.pi / 8, np.pi / 4, 3 * np.pi / 8):
            pts.append(p + sgn * np.sin(lat) * r * a
                       + np.cos(lat) * r * ring)
    return np.concatenate([np.atleast_2d(x) for x in pts]).astype(np.float32)


def _ur5_hulls() -> dict[str, np.ndarray]:
    """Synthetic hulls from the UR5 capsule spec: the UR5 has no reference
    meshes — its capsule spec IS its collision definition (models/specs.py),
    so hull mode gets capsule-polytope inner approximations (sub-1.2 mm
    support deviation) built per collision link."""
    from rmp_tpu.models.specs import UR5_SPEC
    data = {}
    for link in UR5_SPEC.links:
        if not link.collision:
            continue
        pts = [_capsule_polytope(np.asarray(c.p0), np.asarray(c.p1), c.radius)
               for c in link.collision]
        data[link.name] = np.concatenate(pts)
    return data


_SYNTH_HULLS = {"TwoJointRobot": _two_joint_hulls, "UR5": _ur5_hulls}


def _assemble(data, model: KinematicModel) -> np.ndarray | None:
    """Pad per-link vertex lists to a common V (repeating the first vertex,
    harmless under the support max) and stack in collision-frame order.
    None if any collision link is missing from `data` — the caller then
    reports hull mode unavailable instead of half-covered."""
    alias = _LINK_ALIASES.get(model.name, lambda link: link)
    per_link = []
    for i in model.collision_frames:
        link = model.link_names[i]
        if link not in data:
            link = alias(link)
            if link not in data:
                return None
        per_link.append(np.asarray(data[link], np.float32))
    V = max(v.shape[0] for v in per_link)
    return np.stack([
        np.concatenate([v, np.repeat(v[:1], V - v.shape[0], axis=0)])
        for v in per_link])


def hulls_for(model: KinematicModel) -> np.ndarray | None:
    """(L, V, 3) float32 local hull vertices per collision frame, or None."""
    key = (model.name, tuple(model.collision_frames))
    if key in _CACHE:
        return _CACHE[key]
    table = None
    synth = _SYNTH_HULLS.get(model.name)
    if synth is not None:
        table = _assemble(synth(), model)
    else:
        fname = _HULL_FILES.get(model.name)
        if fname is not None:
            path = os.path.join(_ASSET_DIR, fname)
            if os.path.exists(path):
                with np.load(path) as data:
                    table = _assemble(data, model)
    _CACHE[key] = table
    return table
