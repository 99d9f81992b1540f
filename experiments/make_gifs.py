"""Generate demo GIFs for the experiment scenarios (native C++ renderer).

Counterpart of the reference's committed result GIFs
(experiments/*/results/*.gif, reference simulation.py:289-300 capture path).

Usage: python experiments/make_gifs.py [env ...] [--cpu] [--ticks N]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("envs", nargs="*",
                    default=["franka/06_cluttered_environment"])
    ap.add_argument("--ticks", type=int, default=400)
    ap.add_argument("--every", type=int, default=4,
                    help="render every Nth control tick")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--geometry", choices=["capsule", "hull", "visual"],
                    default="capsule",
                    help="hull: draw links as their exact mesh-hull "
                         "collision geometry; visual: draw the reference's "
                         "actual OBJ visual meshes (the PyBullet GUI view)")
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__),
                                                  "results"))
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from rmp_tpu import envs
    from rmp_tpu.envs.cameras import camera_for, eye_target
    from rmp_tpu.utils import native
    from rmp_tpu.utils.render import render_scene, save_gif

    os.makedirs(args.out, exist_ok=True)
    for name in args.envs:
        # keep each env's own resolve_method (overriding with cholesky is
        # invalid near the velocity-cap singular band, core.resolve docs)
        env = envs.make(name)
        state = env.reset(jax.random.PRNGKey(0))
        step = jax.jit(envs.make_control_step(env))
        params = env.gather_params()
        cam_cfg = camera_for(name)   # per-scenario framing (envs/cameras.py)
        frames = []
        for tick in range(args.ticks):
            state, aux = step(state, params)
            if tick % args.every == 0:
                # slow orbit around the configured framing (reference
                # flagship camera orbit, 06_cluttered_environment.py:18-23)
                yaw_off = 90.0 * tick / args.ticks
                camera = eye_target(cam_cfg, yaw_offset_deg=yaw_off)
                if native.available():
                    frames.append(native.render_scene_native(
                        env.model, state.sim, camera=camera,
                        geometry=args.geometry))
                else:
                    frames.append(render_scene(env.model, state.sim))
        suffix = "" if args.geometry == "capsule" else f"_{args.geometry}"
        path = os.path.join(args.out, name.replace("/", "_") + suffix + ".gif")
        save_gif(frames, path, fps=8)
        print(f"{name}: goals reached = {int(state.solved_count)}, "
              f"wrote {path} ({len(frames)} frames)")


if __name__ == "__main__":
    main()
