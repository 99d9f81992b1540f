"""Host-side scene rendering + GIF export (observer only, never in jit).

Capability parity with the reference's visual observability subsystem
(PyBullet GUI camera + imageio GIF writer, simulation.py:289-300,384-386):
a matplotlib 3D wireframe of the robot's collision capsules, obstacles, and
goal, captured at a fixed fps and written as an animated GIF.
"""
from __future__ import annotations

import io

import numpy as np


def render_scene(model, state, objects=(), goal=None, camera=None,
                 figsize=(4, 4), dpi=80) -> np.ndarray:
    """Render one frame to an RGB uint8 array."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from rmp_tpu.models import kinematics as K
    from rmp_tpu.sim.collision import link_world_capsules_all

    fig = plt.figure(figsize=figsize, dpi=dpi)
    ax = fig.add_subplot(projection="3d")

    T_all = np.asarray(K.fk_all(model, state.q))
    # kinematic chain skeleton
    origins = np.concatenate([np.zeros((1, 3)), T_all[:, :3, 3]], axis=0)
    for i, p in enumerate(model.parent):
        a = origins[p + 1]
        b = origins[i + 1]
        ax.plot(*zip(a, b), color="tab:blue", lw=2)
    # collision capsules
    p0, p1, radius, _ = link_world_capsules_all(model, T_all)
    for a, b in zip(np.asarray(p0), np.asarray(p1)):
        ax.plot(*zip(a, b), color="tab:cyan", lw=4, alpha=0.5)
    # obstacles
    if state.obstacles is not None:
        for a, b in zip(np.asarray(state.obstacles.p0),
                        np.asarray(state.obstacles.p1)):
            ax.plot(*zip(a, b), color="0.3", lw=6, alpha=0.8)
    if goal is not None:
        gp = np.asarray(getattr(goal, "base_position", goal))
        ax.scatter(*gp, color="tab:blue", s=40)
    elif state.goal is not None:
        ax.scatter(*np.asarray(state.goal), color="tab:blue", s=40)

    lim = camera["limit"] if camera and "limit" in camera else 1.2
    ax.set_xlim(-lim, lim)
    ax.set_ylim(-lim, lim)
    ax.set_zlim(0, 2 * lim)
    if camera and "azim" in camera:
        ax.view_init(elev=camera.get("elev", 30), azim=camera["azim"])
    ax.set_axis_off()
    fig.tight_layout(pad=0)

    buf = io.BytesIO()
    fig.savefig(buf, format="raw", dpi=dpi)
    w, h = fig.canvas.get_width_height()
    frame = np.frombuffer(buf.getvalue(), dtype=np.uint8).reshape(h, w, 4)[..., :3]
    plt.close(fig)
    return frame.copy()


def save_gif(frames, path: str, fps: int = 16) -> None:
    """Write frames (list of HxWx3 uint8) to an animated GIF."""
    from PIL import Image
    imgs = [Image.fromarray(f) for f in frames]
    if not imgs:
        return
    imgs[0].save(path, save_all=True, append_images=imgs[1:],
                 duration=int(1000 / fps), loop=0)
