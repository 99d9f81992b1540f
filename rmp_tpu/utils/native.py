"""ctypes bindings for the native C++ renderer (native/tinyrender.cpp).

Builds on first use with `make -C native` (g++), mirroring the reference's
reliance on PyBullet's C++ TinyRenderer for camera frames
(simulation.py:296-300). Falls back to the matplotlib renderer
(utils/render.py) when no C++ toolchain is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), os.pardir, os.pardir,
                           "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtinyrender.so")
_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    try:
        # no-op when the .so is newer than tinyrender.cpp; rebuilds stale
        # libraries from older checkouts (e.g. ones without the hull entry)
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    except (OSError, subprocess.CalledProcessError):
        if not os.path.exists(_LIB_PATH):
            raise
    lib = ctypes.CDLL(_LIB_PATH)
    lib.rmp_render_frame.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.rmp_render_frame.restype = None
    # Guarded: a stale prebuilt .so from a checkout without the hull entry
    # (plus no toolchain to rebuild) must still serve capsule rendering —
    # only hull-geometry rendering degrades (render_scene_native falls back).
    if hasattr(lib, "rmp_render_frame_hulls"):
        lib.rmp_render_frame_hulls.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.rmp_render_frame_hulls.restype = None
    if hasattr(lib, "rmp_render_frame_meshes"):
        lib.rmp_render_frame_meshes.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,        # capsules
            ctypes.POINTER(ctypes.c_float),                      # verts
            ctypes.POINTER(ctypes.c_float),                      # normals
            ctypes.POINTER(ctypes.c_int32),                      # tris
            ctypes.POINTER(ctypes.c_int32),                      # v_off
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,        # t_off, n
            ctypes.POINTER(ctypes.c_int32),                      # inst_mesh
            ctypes.POINTER(ctypes.c_float),                      # inst_pose
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,        # color, n
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.rmp_render_frame_meshes.restype = None
    _LIB = lib
    return lib


def hulls_available() -> bool:
    try:
        return hasattr(_load(), "rmp_render_frame_hulls")
    except Exception:
        return False


def meshes_available() -> bool:
    try:
        return hasattr(_load(), "rmp_render_frame_meshes")
    except Exception:
        return False


def cylinder_rows_available() -> bool:
    try:
        return hasattr(_load(), "rmp_has_cylinder_rows")
    except Exception:
        return False


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def render_capsules(capsules: np.ndarray, camera: np.ndarray,
                    width: int = 320, height: int = 240) -> np.ndarray:
    """Ray-trace capsules [(p0 xyz, p1 xyz, radius, rgb) x N] from a camera
    [eye xyz, target xyz, fov_deg] -> (H, W, 3) uint8."""
    lib = _load()
    caps = np.ascontiguousarray(capsules, dtype=np.float32)
    assert caps.ndim == 2 and caps.shape[1] == 10
    cam = np.ascontiguousarray(camera, dtype=np.float32)
    assert cam.shape == (7,)
    out = np.empty((height, width, 3), dtype=np.uint8)
    lib.rmp_render_frame(
        caps.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(caps),
        cam.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), width, height,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def render_hulls(capsules: np.ndarray, planes: np.ndarray,
                 counts: np.ndarray, colors: np.ndarray, camera: np.ndarray,
                 width: int = 320, height: int = 240) -> np.ndarray:
    """Ray-trace capsules PLUS convex polytopes. planes: concatenated
    (sum counts, 4) world half-space rows [n xyz, d] (inside: n.x <= d);
    counts: per-hull plane counts; colors: (n_hulls, 3)."""
    lib = _load()
    if not hasattr(lib, "rmp_render_frame_hulls"):
        raise RuntimeError(
            "libtinyrender.so is stale (no rmp_render_frame_hulls symbol) "
            "and could not be rebuilt; run `make -C native`")
    caps = np.ascontiguousarray(capsules, dtype=np.float32).reshape(-1, 10)
    pl = np.ascontiguousarray(planes, dtype=np.float32)
    cnt = np.ascontiguousarray(counts, dtype=np.int32)
    col = np.ascontiguousarray(colors, dtype=np.float32)
    assert pl.ndim == 2 and pl.shape[1] == 4 and pl.shape[0] == cnt.sum()
    assert col.shape == (len(cnt), 3)
    cam = np.ascontiguousarray(camera, dtype=np.float32)
    assert cam.shape == (7,)
    out = np.empty((height, width, 3), dtype=np.uint8)
    lib.rmp_render_frame_hulls(
        caps.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(caps),
        pl.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cnt.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        col.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(cnt),
        cam.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), width, height,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def render_meshes(capsules: np.ndarray, scene_pack: dict,
                  inst_pose: np.ndarray, camera: np.ndarray,
                  width: int = 320, height: int = 240) -> np.ndarray:
    """Ray-trace capsules PLUS rigid triangle-mesh instances (BVH path).
    scene_pack: the cached concatenated mesh library from _visual_scene;
    inst_pose: (n_inst, 12) [R row-major | t] world poses."""
    lib = _load()
    if not hasattr(lib, "rmp_render_frame_meshes"):
        raise RuntimeError(
            "libtinyrender.so is stale (no rmp_render_frame_meshes symbol) "
            "and could not be rebuilt; run `make -C native`")
    caps = np.ascontiguousarray(capsules, dtype=np.float32).reshape(-1, 10)
    pose = np.ascontiguousarray(inst_pose, dtype=np.float32)
    assert pose.ndim == 2 and pose.shape[1] == 12
    assert pose.shape[0] == len(scene_pack["inst_mesh"])
    cam = np.ascontiguousarray(camera, dtype=np.float32)
    assert cam.shape == (7,)
    out = np.empty((height, width, 3), dtype=np.uint8)

    def fp(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

    def ip(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    lib.rmp_render_frame_meshes(
        fp(caps), len(caps),
        fp(scene_pack["verts"]), fp(scene_pack["normals"]),
        ip(scene_pack["tris"]), ip(scene_pack["v_off"]),
        ip(scene_pack["t_off"]), len(scene_pack["v_off"]) - 1,
        ip(scene_pack["inst_mesh"]), fp(pose),
        fp(scene_pack["inst_color"]), len(pose),
        fp(cam), width, height,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


_PLANE_CACHE: dict = {}
_MESH_CACHE: dict = {}

_ROBOT_RGB = (0.85, 0.85, 0.88)    # visual meshes: the reference's white


def _visual_scene(model):
    """Cached concatenated mesh-library arrays for render_meshes, plus the
    per-instance frame indices (-1 = identity base pose), or None when the
    robot has no visual asset (models/meshes.py)."""
    key = (model.name, tuple(model.link_names))
    if key in _MESH_CACHE:
        return _MESH_CACHE[key]
    from rmp_tpu.models.meshes import visual_meshes_for
    loaded = visual_meshes_for(model)
    pack = None
    if loaded is not None:
        meshes, instances = loaded
        v_off = np.cumsum([0] + [len(m["verts"]) for m in meshes])
        t_off = np.cumsum([0] + [len(m["tris"]) for m in meshes])
        pack = dict(
            verts=np.ascontiguousarray(
                np.concatenate([m["verts"] for m in meshes]), np.float32),
            normals=np.ascontiguousarray(
                np.concatenate([m["normals"] for m in meshes]), np.float32),
            tris=np.ascontiguousarray(
                np.concatenate([m["tris"] for m in meshes]), np.int32),
            v_off=v_off.astype(np.int32), t_off=t_off.astype(np.int32),
            inst_mesh=np.asarray([m for m, _ in instances], np.int32),
            inst_frame=np.asarray([f for _, f in instances], np.int32),
            inst_color=np.ascontiguousarray(
                np.tile(np.asarray([_ROBOT_RGB], np.float32),
                        (len(instances), 1))),
        )
    _MESH_CACHE[key] = pack
    return pack


def _hull_planes_local(model):
    """Per-collision-link LOCAL half-space tables [(F_i, 4) n|d rows] from
    the hull vertex assets (models/hulls.py), or None if the robot has no
    hull asset. Cached: the hull is rigid, so the facet planes are computed
    once and rigidly transformed per frame at render time."""
    key = (model.name, tuple(model.collision_frames))
    if key in _PLANE_CACHE:
        return _PLANE_CACHE[key]
    from rmp_tpu.models.hulls import hulls_for
    verts = hulls_for(model)
    planes = None
    if verts is not None:
        from scipy.spatial import ConvexHull
        planes = []
        for v in np.asarray(verts, np.float64):
            hull = ConvexHull(v, qhull_options="QJ")       # QJ: joggle ties
            # qhull: n.x + b <= 0 inside  ->  n.x <= d with d = -b
            eq = hull.equations
            planes.append(np.concatenate(
                [eq[:, :3], -eq[:, 3:4]], axis=-1).astype(np.float32))
    _PLANE_CACHE[key] = planes
    return planes


def render_scene_native(model, state, goal=None, camera=None,
                        width: int = 320, height: int = 240,
                        geometry: str = "capsule") -> np.ndarray:
    """Native-rendered frame of a SimState (robot capsules + obstacles +
    goal). camera: dict(eye, target, fov) or None for the default orbit.

    geometry='hull' draws the robot links as their EXACT convex-hull
    collision geometry (models/hulls.py — the decimated reference meshes);
    geometry='visual' draws the reference's actual OBJ visual triangle
    meshes (models/meshes.py, what the reference's PyBullet GUI shows —
    reference simulation.py:296-300). Both fall back to capsules when the
    robot has no matching asset."""
    from rmp_tpu.models import kinematics as K
    from rmp_tpu.sim.collision import link_world_capsules_all

    T_all = np.asarray(K.fk_all(model, state.q))
    mesh_pack = None
    if geometry == "visual":
        mesh_pack = _visual_scene(model) if meshes_available() else None
    hull_planes = None
    if geometry == "hull":
        local = _hull_planes_local(model) if hulls_available() else None
        if local is not None:
            # rigid plane transform: n.x_loc <= d with x_loc = R^T(x - t)
            # -> (R n).x <= d + (R n).t
            hull_planes, hull_counts = [], []
            for f, pl in zip(model.collision_frames, local):
                R, t = T_all[f, :3, :3], T_all[f, :3, 3]
                n_w = pl[:, :3] @ R.T
                d_w = pl[:, 3] + n_w @ t
                hull_planes.append(
                    np.concatenate([n_w, d_w[:, None]], axis=-1))
                hull_counts.append(len(pl))
    p0, p1, radius, _ = link_world_capsules_all(model, T_all)
    p0, p1, radius = (np.asarray(v) for v in (p0, p1, radius))
    rows = []
    if hull_planes is None and mesh_pack is None:
        for a, b, r in zip(p0, p1, radius):
            rows.append([*a, *b, r, 0.25, 0.45, 0.8])       # robot: blue
    if state.obstacles is not None:
        kinds = state.obstacles.kinds
        # negative radius tags a FLAT-capped cylinder for the native
        # renderer (internal row convention; feature-probed so a stale
        # library still renders everything as capsules)
        tag_cyl = kinds is not None and cylinder_rows_available()
        for k, (a, b, r) in enumerate(zip(np.asarray(state.obstacles.p0),
                                          np.asarray(state.obstacles.p1),
                                          np.asarray(state.obstacles.radius))):
            rr = -r if tag_cyl and kinds[k] == "cylinder" else r
            rows.append([*a, *b, rr, 0.35, 0.35, 0.35])     # obstacles: grey
    gp = None
    if goal is not None:
        gp = np.asarray(getattr(goal, "base_position", goal))
    elif state.goal is not None:
        gp = np.asarray(state.goal)
    if gp is not None:
        for g in np.atleast_2d(gp):   # multi-goal scenes: one marker each
            rows.append([*g, *g, 0.03, 0.1, 0.2, 0.9])      # goal: marker
    cam = camera or dict(eye=(1.6, -1.6, 1.2), target=(0.0, 0.0, 0.4), fov=50)
    cam_arr = np.asarray([*cam["eye"], *cam["target"], cam["fov"]],
                         dtype=np.float32)
    caps_arr = (np.asarray(rows, dtype=np.float32) if rows
                else np.zeros((0, 10), np.float32))
    if mesh_pack is not None:
        poses = []
        for f in mesh_pack["inst_frame"]:
            T = np.eye(4, dtype=np.float32) if f < 0 else T_all[f]
            poses.append(np.concatenate(
                [np.asarray(T[:3, :3], np.float32).reshape(-1),
                 np.asarray(T[:3, 3], np.float32)]))
        return render_meshes(caps_arr, mesh_pack, np.stack(poses), cam_arr,
                             width, height)
    if hull_planes is not None:
        colors = np.tile(np.asarray([[0.25, 0.45, 0.8]], np.float32),
                         (len(hull_planes), 1))
        return render_hulls(caps_arr, np.concatenate(hull_planes),
                            np.asarray(hull_counts, np.int32), colors,
                            cam_arr, width, height)
    return render_capsules(caps_arr, cam_arr, width, height)
