"""Gain-config sweep for the randomized cluttered scene — ONE compiled
program evaluates a whole grid of policy-gain configurations.

Policy gains are traced pytree leaves (not compile-time constants), so a
(G, ...) stacked params pytree vmaps over the SAME compiled rollout: G gain
configs x B envs roll out together on the chip. This is the structural
advantage over the reference (gains are Python constructor constants there,
simulation.py cannot batch at all): tuning sweeps cost one compile.

Used for VERDICT r2 #3 (randomized-scene success-rate work): pick the best
config, then bake it into envs/franka.env_randomized_cluttered.

Usage: python experiments/sweep_randomized.py [--envs-per-config 256]
         [--ticks 300] [--cpu] [--set accel_p_gain=0.3,0.6,1.0]
         [--set "attractor_*:accel_d_gain=0.6,1.2"]
(keys are policy-params dict keys; unknown keys are a hard error. An
optional policy-name glob prefix routes the key to every matching policy —
needed when one key lives on several policies that must move together, or
on unrelated ones that must not; without it the franka/randomized legacy
routing applies: attractor keys -> policy 0, obstacle keys -> last.)
"""
import argparse
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np

# which policy dict holds each sweepable gain (attractor = policy 0 in
# env_randomized_cluttered's stack; obstacle policy is the last)
ATTRACTOR_KEYS = {"accel_p_gain", "accel_d_gain", "metric_alpha_length_scale"}
OBSTACLE_KEYS = {"damping_gain", "repulsion_gain", "metric_modulation_radius",
                 "metric_scalar", "damping_std_dev"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="franka/randomized_cluttered")
    ap.add_argument("--envs-per-config", type=int, default=256)
    ap.add_argument("--ticks", type=int, default=300)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--set", action="append", default=[],
                    metavar="KEY=V1,V2,...",
                    help="sweep axis: gain key and comma-separated values")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   os.pardir, ".jax_cache"))

    from rmp_tpu import envs

    env = envs.make(args.env)
    base = env.gather_params()

    # an axis is "[policy_glob:]key=v1,v2,...". With a glob, the key is set
    # on every policy whose NAME matches (fnmatch) — required for stacks
    # where one key lives on several policies that must move together
    # (dual-arm: attractor_L/attractor_R) or on unrelated policies that
    # must NOT (damping_gain is on both the velocity cap and the obstacle
    # policy). Without a glob, the legacy franka/randomized_cluttered
    # index routing applies (attractor = policy 0, obstacle = last).
    import fnmatch
    names = [p.name for p in env.policies]

    axes = []
    for spec in args.set or ["accel_p_gain=0.3,0.6,1.0"]:
        sel, _, rest = spec.rpartition(":")
        key, _, vals = rest.partition("=")
        axes.append((sel or None, key.strip(),
                     [float(v) for v in vals.split(",")]))
    grid = list(itertools.product(*[vals for _, _, vals in axes]))
    G = len(grid)

    applied = {(sel, key): 0 for sel, key, _ in axes}

    def params_for(combo):
        out = []
        for i, prm in enumerate(base):
            prm = dict(prm)
            for (sel, key, _), val in zip(axes, combo):
                if sel is not None:
                    hit = fnmatch.fnmatch(names[i], sel) and key in prm
                else:
                    hit = ((key in ATTRACTOR_KEYS and i == 0) or
                           (key in OBSTACLE_KEYS and i == len(base) - 1) or
                           (key not in ATTRACTOR_KEYS | OBSTACLE_KEYS
                            and key in prm)) and key in prm
                if hit:
                    prm[key] = jnp.asarray(val, jnp.float32)
                    applied[(sel, key)] += 1
            out.append(prm)
        return tuple(out)

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs),
                           *[params_for(c) for c in grid])
    dead = [(sel, k) for (sel, k), n in applied.items() if n == 0]
    if dead:
        avail = sorted({k for prm in base for k in prm})
        sys.stderr.write(f"policy names: {names}\n")
        sys.exit(f"--set key(s) {dead} match no policy params; a sweep over "
                 f"them would silently be a no-op. Available keys: {avail}")

    B = args.envs_per_config
    states = envs.make_batched_reset(env, B)(jax.random.PRNGKey(args.seed))
    rollout = envs.make_batched_rollout(env, args.ticks)

    from rmp_tpu.models import kinematics as K
    from rmp_tpu.sim.collision import robot_obstacle_distances

    @jax.jit
    def run(stacked_params):
        def one(prm):
            final, aux = rollout(states, prm)
            solved_any = jnp.any(aux["solved"], axis=1)
            ev = aux["resample"]
            has_ev = jnp.any(ev, axis=1)
            first_ev = jnp.argmax(ev, axis=1)
            sol = jnp.take_along_axis(aux["solved"], first_ev[:, None],
                                      axis=1)[:, 0]

            def min_clear(sim):
                T_all = K.fk_all(env.model, sim.q)
                _, _, _, d = robot_obstacle_distances(env.model, T_all,
                                                      sim.obstacles)
                return jnp.min(d)
            pen = (jax.vmap(min_clear)(final.sim) < -0.01
                   if final.sim.obstacles is not None
                   else jnp.zeros((), jnp.float32))
            return dict(
                success=jnp.mean(solved_any.astype(jnp.float32)),
                first_goal=jnp.mean((has_ev & sol).astype(jnp.float32)),
                goals=jnp.mean(final.solved_count.astype(jnp.float32)),
                penetration=jnp.mean(pen.astype(jnp.float32)),
                nan=jnp.mean(jnp.any(jnp.isnan(final.sim.q), axis=-1)
                             .astype(jnp.float32)))
        return jax.vmap(one)(stacked_params)

    t0 = time.perf_counter()
    metrics = jax.tree.map(np.asarray, run(stacked))
    wall = time.perf_counter() - t0

    rows = []
    for gi, combo in enumerate(grid):
        row = {(f"{sel}:{key}" if sel else key): val
               for (sel, key, _), val in zip(axes, combo)}
        row.update({k: round(float(v[gi]), 4) for k, v in metrics.items()})
        rows.append(row)
    rows.sort(key=lambda r: -r["success"])
    print(json.dumps({"env": args.env, "envs_per_config": B,
                      "ticks": args.ticks, "wall_s": round(wall, 1),
                      "results": rows}, indent=2))


if __name__ == "__main__":
    main()
