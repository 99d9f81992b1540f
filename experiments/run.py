"""Run any registered experiment scenario from the command line.

Usage:
    python experiments/run.py franka/06_cluttered_environment --ticks 600 --gif out.gif
    python experiments/run.py --list

Mirrors the reference's per-scenario scripts (experiments/*/0*.py) on top of
the env registry; optional GIF recording reproduces the reference's
16 fps animation capture (simulation.py:289-300).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import argparse
import time

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("env", nargs="?", help="registry name, e.g. franka/06_cluttered_environment")
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--ticks", type=int, default=300, help="control ticks (10 Hz)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--gif", type=str, default=None)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--geometry", choices=("capsule", "hull"),
                    default="capsule", help="link collision geometry")
    ap.add_argument("--save", type=str, default=None, metavar="TRAJ.NPZ",
                    help="dump the trajectory (t, q, qd, goal, ee, "
                         "solved_count per tick) to an .npz")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from rmp_tpu import envs
    from rmp_tpu.envs.base import ee_position, make_control_step

    if args.list or not args.env:
        for name in envs.REGISTRY:
            print(name)
        return

    if args.env not in envs.REGISTRY:
        known = "\n  ".join(sorted(envs.REGISTRY))
        raise SystemExit(f"unknown env '{args.env}'; available:\n  {known}")
    env = envs.make(args.env)
    env.collision_geometry = args.geometry
    state = env.reset(jax.random.PRNGKey(args.seed))
    step = jax.jit(make_control_step(env))
    params = env.gather_params()

    frames = []
    traj: dict[str, list] = {k: [] for k in ("q", "qd", "goal", "ee",
                                             "solved_count")}
    t0 = time.perf_counter()
    for tick in range(args.ticks):
        state, aux = step(state, params)
        if args.save:
            traj["q"].append(np.asarray(state.sim.q))
            traj["qd"].append(np.asarray(state.sim.qd))
            if state.sim.goal is not None:
                traj["goal"].append(np.asarray(state.sim.goal))
                traj["ee"].append(np.asarray(ee_position(env, state.sim)))
            traj["solved_count"].append(int(state.solved_count))
        if args.gif and tick % 2 == 0:   # ~5 fps of control ticks
            from rmp_tpu.utils.render import render_scene
            frames.append(render_scene(env.model, state.sim))
        if tick % 50 == 0 and state.sim.goal is not None:
            ee = np.asarray(ee_position(env, state.sim))
            goal = np.asarray(state.sim.goal)
            print(f"tick {tick:5d}  |ee-goal| = "
                  f"{np.linalg.norm(ee - goal):.4f}  goals reached = "
                  f"{int(state.solved_count)}")
    dt = time.perf_counter() - t0
    print(f"{args.ticks} control ticks in {dt:.2f}s "
          f"({args.ticks / dt:.1f} ticks/s incl. host loop)")
    print(f"final q  = {np.asarray(state.sim.q)}")
    print(f"final qd = {np.asarray(state.sim.qd)}")
    print(f"goals reached = {int(state.solved_count)}")

    if args.gif and frames:
        from rmp_tpu.utils.render import save_gif
        save_gif(frames, args.gif)
        print(f"wrote {args.gif} ({len(frames)} frames)")

    if args.save:
        tick_dt = env.dt * env.control_every
        np.savez_compressed(
            args.save,
            t=np.arange(1, args.ticks + 1, dtype=np.float32) * tick_dt,
            **{k: np.stack(v) for k, v in traj.items() if v})
        print(f"wrote {args.save} ({args.ticks} ticks)")


if __name__ == "__main__":
    main()
