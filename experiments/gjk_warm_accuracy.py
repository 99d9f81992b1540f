"""Rollout-level accuracy of the hull tier's temporal GJK warm start.

The warm-tick iteration count (RMP_GJK_ITERS) trades Pallas GJK kernel time
against distance accuracy ALONG TRAJECTORIES: the warm carry (previous-tick
witness directions) compounds across ticks, so the static randomized-pose
equivalence tests (tests/test_pallas_gjk.py) cannot certify a count by
themselves. This tool rolls out the hull flagship and, at every tick,
re-solves the SAME states cold (10 iterations, capsule-witness start — the
oracle the kernel was validated against) and reports |d_warm - d_cold|
quantiles, overall and for the policy-active pairs (cold distance < 0.5 m,
where the obstacle policy's metric is nonzero; beyond that the result is
multiplied by an exactly-zero weight, policies/v2.py).

Usage: python experiments/gjk_warm_accuracy.py [--iters 4,3] [--batch 1024]
           [--ticks 150] [--env franka/06_cluttered_environment] [--cpu]
Prints one JSON report per candidate count (comma-separated --iters share
one process so the cold-oracle compile is paid once).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

# error bands by oracle distance: the obstacle policy's metric is exactly
# zero beyond 0.5 m (policies/v2.py); < 0.1 m is where repulsion dominates
BANDS = ((0.0, 0.1), (0.1, 0.5), (0.5, np.inf))


def run_one(env_name: str, iters: int, batch: int, ticks: int,
            seed: int) -> dict:
    import jax
    import jax.numpy as jnp

    from rmp_tpu import envs
    from rmp_tpu.envs import base as eb
    from rmp_tpu.models import kinematics as K
    from rmp_tpu.sim.collision import robot_obstacle_distances_hull_batched
    from rmp_tpu.sim.data import PAIRS_KEY, distance_context_batched

    # read at trace time by sim.data.distance_context_batched
    os.environ["RMP_GJK_ITERS"] = str(iters)

    env = envs.make(env_name)
    env.collision_geometry = "hull"
    env.resolve_method = "solve"
    env.hull_warm_iters = iters          # probe the candidate count end-to-end
    params = env.gather_params()
    states = envs.make_batched_reset(env, batch)(jax.random.PRNGKey(seed))
    step = eb.make_batched_control_step(env)
    model = env.model

    def probe(state):
        """(next_state, per-tick stats): warm distances exactly as the
        fused step computes them vs the cold 10-iteration oracle on the
        same transforms."""
        T_all_b = jax.vmap(lambda q: K.fk_all(model, q))(state.sim.q)
        ctx, _ = distance_context_batched(model, T_all_b,
                                          state.sim.obstacles, "hull",
                                          warm=state.gjk_warm)
        d_warm = ctx[PAIRS_KEY]["distance"]
        d_cold = robot_obstacle_distances_hull_batched(
            model, T_all_b, state.sim.obstacles, iters=10, warm=None)[3]
        diff = jnp.abs(d_warm - d_cold)
        stats = {}
        for lo, hi in BANDS:
            sel = (d_cold >= lo) & (d_cold < hi)
            n = jnp.maximum(jnp.sum(sel), 1)
            sd = jnp.where(sel, diff, 0.0)
            key = f"{lo:g}-{hi:g}"
            stats[f"max@{key}"] = jnp.max(sd)
            stats[f"mean@{key}"] = jnp.sum(sd) / n
            stats[f"p99@{key}"] = jnp.nanpercentile(
                jnp.where(sel, diff, jnp.nan), 99)
            stats[f"frac@{key}"] = jnp.mean(sel.astype(jnp.float32))
        new_state, aux = step(state, params)
        return new_state, stats, aux["qdd"]

    probe = jax.jit(probe)
    # POLICY-IMPACT probe: the same control step traced with the COLD
    # iteration count (distance_context_batched reads RMP_GJK_ITERS at
    # trace time) — |qdd_warm - qdd_cold| on IDENTICAL states is the
    # policy-output error the distance error actually induces, the
    # quantity the banded distance tails only proxy.
    _, _, _ = probe(states)                  # trace probe with `iters`
    # the env-level pin OVERRIDES the env var inside the control step
    # (envs/base.py passes iters=env.hull_warm_iters), so the cold trace
    # must raise BOTH — leaving hull_warm_iters at `iters` here silently
    # traced an identical step and reported qdd_abs_err == 0 exactly
    os.environ["RMP_GJK_ITERS"] = "10"
    env.hull_warm_iters = 10
    step_cold_qdd = jax.jit(
        lambda s: eb.make_batched_control_step(env)(s, params)[1]["qdd"])
    _ = step_cold_qdd(states)                # trace with 10
    os.environ["RMP_GJK_ITERS"] = str(iters)
    env.hull_warm_iters = iters

    per_tick = []
    qdd_err_max = qdd_err_p99 = qdd_rms = 0.0
    qdd_p99_ticks = []
    s = states
    for _ in range(ticks):
        qdd_c = step_cold_qdd(s)
        s, st, qdd_w = probe(s)
        per_tick.append({k: float(v) for k, v in st.items()})
        e = np.abs(np.asarray(qdd_w) - np.asarray(qdd_c))
        qdd_err_max = max(qdd_err_max, float(e.max()))
        qdd_err_p99 = max(qdd_err_p99, float(np.percentile(e, 99)))
        qdd_p99_ticks.append(float(np.percentile(e, 99)))
        qdd_rms += float(np.sqrt(np.mean(np.asarray(qdd_c) ** 2))) / ticks

    report = {"env": env_name, "iters_warm": iters, "batch": batch,
              "ticks": ticks}
    for lo, hi in BANDS:
        key = f"{lo:g}-{hi:g}"
        # nanmax/nanmean: a tick whose band holds no pairs reports NaN
        # (nanpercentile of an all-NaN select) and must not poison the
        # across-ticks aggregate
        report[f"abs_err_max_m@{key}"] = float(np.max(
            [t[f"max@{key}"] for t in per_tick]))
        report[f"abs_err_p99_m@{key}"] = float(np.nanmax(
            [t[f"p99@{key}"] for t in per_tick]))
        report[f"abs_err_p99_med_tick_m@{key}"] = float(np.nanmedian(
            [t[f"p99@{key}"] for t in per_tick]))
        report[f"abs_err_mean_m@{key}"] = float(np.mean(
            [t[f"mean@{key}"] for t in per_tick]))
        report[f"pair_frac@{key}"] = float(np.mean(
            [t[f"frac@{key}"] for t in per_tick]))
    report["qdd_abs_err_max"] = qdd_err_max
    report["qdd_abs_err_p99_worst_tick"] = qdd_err_p99
    # late-tick split: randomized scenes can SPAWN obstacles in deep
    # penetration (max_qdd-clamped chaotic transients for the first ~10
    # ticks); the median per-tick p99 past tick 20 describes the distance
    # error's policy impact on nominal operation
    late = qdd_p99_ticks[min(20, len(qdd_p99_ticks) - 1):]
    report["qdd_abs_err_p99_median_tick"] = float(np.median(qdd_p99_ticks))
    report["qdd_abs_err_p99_median_late_tick"] = float(np.median(late))
    report["qdd_rms_cold"] = qdd_rms
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", default="4",
                    help="comma-separated warm-tick GJK iteration counts")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--ticks", type=int, default=150)
    ap.add_argument("--env", default="franka/06_cluttered_environment")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    for it in (int(v) for v in args.iters.split(",")):
        print(json.dumps(run_one(args.env, it, args.batch, args.ticks,
                                 args.seed), indent=2))


if __name__ == "__main__":
    main()
