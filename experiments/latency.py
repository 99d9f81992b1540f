"""Closed-loop control latency: the serving-side complement to bench.py.

bench.py measures amortized batched THROUGHPUT (chained async dispatch, one
read at the end) — the training / large-scale-evaluation regime. A deployed
RMP controller is the opposite regime: a reactive loop that must read the
joint command back every tick (sense -> policies -> resolve -> substeps ->
command out). No async pipelining can hide dispatch or device->host latency
in a closed loop, so this tool measures it honestly:

  * each timed tick ends with a host read of the joint state (the value a
    robot-side servo loop needs) via np.asarray — not block_until_ready,
    which was observed to under-wait through the axon tunnel (CLAUDE.md);
  * per batch size: p50 / p90 / p99 wall latency over --ticks ticks after
    a warmup tick, plus the real-time factor vs the scenario's control
    period (control_every * dt = 0.1 s at the reference's 10 Hz design
    rate, BASELINE.md);
  * the TPU path includes the axon tunnel's fixed ~30 ms per-dispatch RPC
    cost that a locally-attached chip would not pay — run with --cpu for
    the host-local backend (an on-robot CPU deployment) to see the
    tunnel-free shape of the curve. Both are deployment-relevant numbers.

The reference closes this loop through PyBullet + TF eager at 1 env
(reference simulation.py:275, 10 Hz control design rate); here one dispatch
serves the whole batch, so the marginal latency of robot #4096 is ~zero.

Usage: python experiments/latency.py [--env NAME] [--batches 1,8,512,4096]
       [--ticks 200] [--cpu] [--geometry capsule|hull] [--out FILE]
Writes reports/latency.json (or latency_cpu.json) by default.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def measure(env_name: str, batches: list[int], ticks: int, geometry: str,
            seed: int = 0) -> dict:
    import jax

    from rmp_tpu import envs

    env = envs.make(env_name)
    env.collision_geometry = geometry
    env.resolve_method = "solve"
    params = env.gather_params()
    platform = jax.devices()[0].platform

    rows = []
    for batch in batches:
        # the fused Pallas resolve needs lane-width batches and a real TPU
        fused = batch % 128 == 0 and platform == "tpu"
        states = envs.make_batched_reset(env, batch)(
            jax.random.PRNGKey(seed))
        tick = jax.jit(envs.make_batched_rollout(
            env, 1, fused_resolve=fused, with_aux=False))

        t0 = time.perf_counter()
        s, _ = tick(states, params)
        np.asarray(s.sim.q)
        compile_s = time.perf_counter() - t0

        lat = np.empty(ticks)
        for i in range(ticks):
            t0 = time.perf_counter()
            s, _ = tick(s, params)
            np.asarray(s.sim.q)          # the command the robot consumes
            lat[i] = time.perf_counter() - t0
        p50, p90, p99 = (float(np.percentile(lat, p)) for p in (50, 90, 99))
        control_period = env.dt * env.control_every
        rows.append({
            "batch": batch,
            "fused_resolve": fused,
            "p50_ms": round(p50 * 1e3, 3),
            "p90_ms": round(p90 * 1e3, 3),
            "p99_ms": round(p99 * 1e3, 3),
            "control_rate_hz_p50": round(1.0 / p50, 1),
            # how many x faster than the scenario's own control period the
            # loop closes (>= 1.0: real-time capable at the design rate)
            "realtime_factor_p50": round(control_period / p50, 2),
            "batched_steps_per_sec_p50": round(batch / p50, 1),
            "compile_s": round(compile_s, 1),
        })
        print(f"  batch {batch:5d}: p50 {p50 * 1e3:7.2f} ms  "
              f"p99 {p99 * 1e3:7.2f} ms  "
              f"rt-factor {control_period / p50:6.1f}x"
              + ("  (fused)" if fused else ""), file=sys.stderr)
    return {
        "env": env_name,
        "geometry": geometry,
        "platform": platform,
        "ticks_per_point": ticks,
        "control_period_s": env.dt * env.control_every,
        "note": ("TPU numbers include the axon tunnel's fixed ~30 ms "
                 "per-dispatch RPC cost (not paid by a locally-attached "
                 "chip)" if platform == "tpu" else
                 "host-local backend: no dispatch tunnel in the loop"),
        "points": rows,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="franka/06_cluttered_environment")
    ap.add_argument("--batches", default="1,8,64,512,4096",
                    help="comma-separated batch sizes")
    ap.add_argument("--ticks", type=int, default=200)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--geometry", choices=("capsule", "hull"),
                    default="capsule")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    batches = [int(b) for b in args.batches.split(",")]
    report = measure(args.env, batches, args.ticks, args.geometry,
                     seed=args.seed)
    out = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), os.pardir, "reports",
        "latency_cpu.json" if args.cpu else "latency.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
