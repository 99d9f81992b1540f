"""Launch the interactive live viewer for a scenario.

The TPU-native counterpart of the reference's PyBullet debug GUI
(simulation.py:325-330 + camera_config.py): a browser page with a live
rendered stream of the running simulation, orbit/zoom camera controls,
pause/resume/reset. See rmp_tpu/utils/viewer.py.

Usage:
    python experiments/viewer.py [env] [--port 8777] [--cpu] [--no-realtime]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("env", nargs="?", default="franka/06_cluttered_environment")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8777)
    ap.add_argument("--width", type=int, default=480)
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--no-realtime", action="store_true",
                    help="step as fast as possible instead of wall-clock rate")
    ap.add_argument("--geometry", choices=["capsule", "hull", "visual"],
                    default="capsule",
                    help="hull: exact mesh-hull collision geometry; visual: "
                         "the reference's OBJ visual meshes (PyBullet GUI "
                         "view)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from rmp_tpu import envs
    from rmp_tpu.utils.viewer import SimViewer

    if args.env not in envs.REGISTRY:
        known = "\n  ".join(sorted(envs.REGISTRY))
        raise SystemExit(f"unknown env '{args.env}'; available:\n  {known}")

    SimViewer(envs.make(args.env), host=args.host, port=args.port,
              width=args.width, height=args.height,
              realtime=not args.no_realtime, geometry=args.geometry).serve()


if __name__ == "__main__":
    main()
