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
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.rmp_render_frame.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.rmp_render_frame.restype = None
    _LIB = lib
    return lib


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


def render_scene_native(model, state, goal=None, camera=None,
                        width: int = 320, height: int = 240) -> np.ndarray:
    """Native-rendered frame of a SimState (robot capsules + obstacles +
    goal). camera: dict(eye, target, fov) or None for the default orbit."""
    from rmp_tpu.models import kinematics as K
    from rmp_tpu.sim.collision import link_world_capsules_all

    T_all = np.asarray(K.fk_all(model, state.q))
    p0, p1, radius, _ = link_world_capsules_all(model, T_all)
    p0, p1, radius = (np.asarray(v) for v in (p0, p1, radius))
    rows = []
    for a, b, r in zip(p0, p1, radius):
        rows.append([*a, *b, r, 0.25, 0.45, 0.8])           # robot: blue
    if state.obstacles is not None:
        for a, b, r in zip(np.asarray(state.obstacles.p0),
                           np.asarray(state.obstacles.p1),
                           np.asarray(state.obstacles.radius)):
            rows.append([*a, *b, r, 0.35, 0.35, 0.35])      # obstacles: grey
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
    return render_capsules(np.asarray(rows, dtype=np.float32), cam_arr,
                           width, height)
