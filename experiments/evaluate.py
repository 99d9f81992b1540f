"""Large-scale evaluation sweep: success metrics over randomized env batches.

The production-evaluation counterpart of the demos (BASELINE.json north star:
domain-randomized evaluation sweeps over thousands of envs): rolls out a
batch of domain-randomized cluttered scenes on the accelerator and reports
success rate, goals reached, collision (penetration) statistics, and
throughput.

Usage: python experiments/evaluate.py [--batch 4096] [--ticks 300] [--env NAME]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="franka/randomized_cluttered")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--ticks", type=int, default=300)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--geometry", choices=("capsule", "hull"),
                    default="capsule",
                    help="link collision geometry (hull = exact mesh-hull "
                         "GJK; requires a hull asset for the robot)")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   os.pardir, ".jax_cache"))

    from rmp_tpu import envs
    from rmp_tpu.models import kinematics as K
    from rmp_tpu.sim.collision import (robot_obstacle_distances,
                                       robot_obstacle_distances_hull)

    # keep each env's own resolve_method (randomized_cluttered defaults to
    # the indefinite-safe 'solve'; overriding with cholesky here once biased
    # the sweep metrics near the velocity-cap singular band — ADVICE r1)
    env = envs.make(args.env)
    env.collision_geometry = args.geometry
    fused = args.batch % 128 == 0 and not args.cpu
    states = envs.make_batched_reset(env, args.batch)(
        jax.random.PRNGKey(args.seed))
    rollout = jax.jit(envs.make_batched_rollout(env, args.ticks,
                                                fused_resolve=fused))
    t0 = time.perf_counter()
    final, aux = rollout(states, env.gather_params())
    jax.block_until_ready(final.sim.q)
    wall = time.perf_counter() - t0

    solved_any = np.asarray(jnp.any(aux["solved"], axis=1))
    goals = np.asarray(final.solved_count)

    # First-goal outcome per env: under on_solved resampling, whole-run
    # success mixes goals drawn mid-run into the statistic. aux["resample"]
    # marks every tick the resampling hook fired (solve OR stuck-timeout);
    # the FIRST such event decides the first goal's fate — solved there
    # means the initial goal was reached before any swap. Envs with no
    # event within the horizon left their first goal unsolved.
    if "resample" in aux:
        sol = np.asarray(aux["solved"])
        ev = np.asarray(aux["resample"])
        has_ev = ev.any(axis=1)
        first_ev = ev.argmax(axis=1)
        first_goal_solved = has_ev & sol[np.arange(len(sol)), first_ev]
    else:
        first_goal_solved = solved_any

    # goal feasibility: uniformly sampled goals can land inside or within
    # EE-clearance of an obstacle — unreachable by ANY policy. Computed on
    # the INITIAL state so it describes the same goals whose outcome
    # first_goal_solved records (the rate is an unbiased statistic of the
    # goal distribution either way — iid draws).
    goal_feasible = None
    if final.sim.obstacles is not None and final.sim.goal is not None:
        @jax.jit
        @jax.vmap
        def goal_clear(sim):
            # multi-goal envs (dual-arm) carry (G, 3) goals; feasibility =
            # EVERY goal clear, so report the min clearance over goals
            goals = sim.goal.reshape(-1, 3)
            d = jax.vmap(
                lambda g: jnp.min(point_capsule_distance(g, sim.obstacles)))(
                    goals)
            return jnp.min(d)
        from rmp_tpu.sim.collision import capsule_capsule_query

        def point_capsule_distance(p, obs):
            _, _, _, d = capsule_capsule_query(
                p[None], p[None], jnp.zeros(1), obs.p0, obs.p1, obs.radius)
            return d
        goal_feasible = np.asarray(goal_clear(states.sim)) > 0.03

    clearance_query = (robot_obstacle_distances_hull
                       if args.geometry == "hull"
                       else robot_obstacle_distances)

    @jax.jit
    @jax.vmap
    def min_clearance(sim):
        T_all = K.fk_all(env.model, sim.q)
        _, _, _, d = clearance_query(env.model, T_all, sim.obstacles)
        return jnp.min(d)

    clear = (np.asarray(min_clearance(final.sim))
             if final.sim.obstacles is not None else None)

    report = {
        "env": args.env,
        "geometry": args.geometry,
        "batch": args.batch,
        "ticks": args.ticks,
        "success_rate": float(solved_any.mean()),
        "goal_feasible_rate": (float(goal_feasible.mean())
                               if goal_feasible is not None else None),
        "first_goal_success_rate": float(first_goal_solved.mean()),
        "success_rate_feasible_goals": (
            float(first_goal_solved[goal_feasible].mean())
            if goal_feasible is not None and goal_feasible.any() else None),
        "goals_reached_mean": float(goals.mean()),
        "goals_reached_max": int(goals.max()),
        "final_penetration_rate": (float((clear < -0.01).mean())
                                   if clear is not None else None),
        "nan_rate": float(np.isnan(np.asarray(final.sim.q)).any(axis=1).mean()),
        "control_steps_per_sec": round(args.batch * args.ticks / wall, 1),
        "wall_seconds": round(wall, 2),
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
