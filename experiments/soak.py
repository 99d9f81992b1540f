"""Long-horizon stability soak: many envs x many ticks, invariant checks.

Production-readiness evidence the short demos can't give: rolls the
flagship (and optionally any registered env) for thousands of control ticks
and checks the invariants that should hold FOREVER — finite state, joint
limits respected, velocities bounded, goals still being reached late in
the run (the controller hasn't wound up or drifted).

Writes reports/soak_<env-tag>.json. Usage:
    python experiments/soak.py [--env franka/06_cluttered_environment]
                               [--batch 4096] [--ticks 5000] [--chunk 500]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="franka/06_cluttered_environment")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--ticks", type=int, default=5000)
    ap.add_argument("--chunk", type=int, default=500)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--geometry", choices=("capsule", "hull"),
                    default="capsule")
    args = ap.parse_args()
    if args.ticks < args.chunk:
        args.chunk = args.ticks
    args.ticks = (args.ticks // args.chunk) * args.chunk   # whole chunks
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from rmp_tpu import envs

    env = envs.make(args.env)
    env.collision_geometry = args.geometry
    if env.model.n_q <= 9:
        env.resolve_method = "solve"
    env.unroll_substeps = False
    fused = (args.batch % 128 == 0 and env.resolve_method == "solve"
             and not args.cpu)
    states = envs.make_batched_reset(env, args.batch)(jax.random.PRNGKey(0))
    roll = jax.jit(envs.make_batched_rollout(env, args.chunk,
                                             fused_resolve=fused,
                                             with_aux=False))
    params = env.gather_params()
    lo = jnp.asarray(env.model.q_lower) - 1e-4
    hi = jnp.asarray(env.model.q_upper) + 1e-4

    t0 = time.perf_counter()
    checks = []
    goals_at = []
    s = states
    for k in range(args.ticks // args.chunk):
        s, _ = roll(s, params)
        q = s.sim.q
        checks.append(dict(
            tick=(k + 1) * args.chunk,
            finite=bool(jnp.isfinite(q).all() & jnp.isfinite(s.sim.qd).all()),
            in_limits=bool(jnp.all((q >= lo) & (q <= hi))),
            max_abs_qd=float(jnp.max(jnp.abs(s.sim.qd))),
        ))
        goals_at.append(float(jnp.mean(s.solved_count.astype(jnp.float32))))
    wall = time.perf_counter() - t0
    # solve-event rate per chunk: for goal-RESAMPLING envs this shows
    # sustained progress (no late-run degradation); for finite-sequence
    # envs it saturates once parked at the terminal goal (see NOTE below)
    rates = [goals_at[0]] + [b - a for a, b in zip(goals_at, goals_at[1:])]

    # NOTE solved_count counts solve EVENTS: once an env parks at the last
    # goal of a finite sequence, the check fires every tick, so the count
    # keeps growing — what matters for stability is that the arm reaches a
    # quiet terminal equilibrium (tiny final velocities) without ever
    # leaving limits or going non-finite.
    report = dict(
        env=args.env, geometry=args.geometry, batch=args.batch,
        ticks=args.ticks,
        all_finite=all(c["finite"] for c in checks),
        always_in_limits=all(c["in_limits"] for c in checks),
        max_abs_qd_overall=max(c["max_abs_qd"] for c in checks),
        final_max_abs_qd=checks[-1]["max_abs_qd"],
        terminal_equilibrium=bool(checks[-1]["max_abs_qd"] < 1e-2),
        solve_events_per_chunk_first=round(rates[0], 2),
        solve_events_per_chunk_last=round(rates[-1], 2),
        # full series: distinguishes a continuing productivity leak from
        # convergence to the stationary solve rate (the first chunks start
        # from the randomized-init distribution, which is easier than the
        # post-goal-cycle stationary one)
        solve_events_per_chunk=[round(r, 2) for r in rates],
        wall_seconds=round(wall, 2),
        checkpoints=checks[-3:],
    )
    tag = args.env.replace("/", "_")
    if args.geometry != "capsule":      # don't overwrite the capsule report
        tag += f"_{args.geometry}"
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                       "reports", f"soak_{tag}.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
