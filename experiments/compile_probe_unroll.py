"""Attribute the BENCH_r03 compile-time regression (VERDICT r3 weak #1).

BENCH_r03.json recorded compile 1412.6s for the flagship bench program
(franka/06, 4096 envs, 150 ticks, fused Pallas resolve, tick_unroll=4) vs
9.2s in r02 (tick_unroll=1). This probe splits the cost per stage for the
EXACT bench program at tick_unroll in {1, 2, 4}:

  lower_s    client-side trace + lowering (pure Python/MLIR, local CPU)
  compile_s  lowered.compile() — XLA + Mosaic, through the axon remote
             compile service (0-130s of uncontrollable noise per CLAUDE.md)
  first_exec first execution after compile (device run + transfer)

Run on the TPU (exclusive!):  python experiments/compile_probe_unroll.py
Repeat runs (the tunnel noise question) with REPS=n env var.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax


def probe(tick_unroll, batch, ticks):
    from rmp_tpu import envs

    env = envs.make("franka/06_cluttered_environment")
    env.resolve_method = "solve"
    params = env.gather_params()
    states = envs.make_batched_reset(env, batch)(jax.random.PRNGKey(0))
    fn = envs.make_batched_rollout(env, ticks, fused_resolve=True,
                                   with_aux=False, tick_unroll=tick_unroll)
    jfn = jax.jit(fn)

    # trace / lower / compile split, with process CPU time alongside wall
    # time: local Python/MLIR work burns CPU; waiting on the axon remote
    # compile service does not
    t0, c0 = time.perf_counter(), time.process_time()
    traced = jfn.trace(states, params)
    t1, c1 = time.perf_counter(), time.process_time()
    lowered = traced.lower()
    t2, c2 = time.perf_counter(), time.process_time()
    compiled = lowered.compile()
    t3, c3 = time.perf_counter(), time.process_time()
    out, _ = compiled(states, params)
    jax.block_until_ready(out.sim.q)
    t4 = time.perf_counter()

    res = dict(tick_unroll=tick_unroll, batch=batch, ticks=ticks,
               trace_s=round(t1 - t0, 1), trace_cpu_s=round(c1 - c0, 1),
               lower_s=round(t2 - t1, 1), lower_cpu_s=round(c2 - c1, 1),
               compile_s=round(t3 - t2, 1), compile_cpu_s=round(c3 - c2, 1),
               first_exec_s=round(t4 - t3, 2),
               hlo_mb=round(len(lowered.as_text()) / 1e6, 1))
    print(json.dumps(res), flush=True)
    return res


def main():
    batch = int(os.environ.get("RMP_BENCH_BATCH", "4096"))
    ticks = int(os.environ.get("RMP_BENCH_TICKS", "150"))
    reps = int(os.environ.get("REPS", "1"))
    unrolls = [int(k) for k in
               os.environ.get("UNROLLS", "1,2,4").split(",")]
    print(f"platform={jax.devices()[0].platform} batch={batch} "
          f"ticks={ticks}", flush=True)
    for _ in range(reps):
        for k in unrolls:
            probe(k, batch, ticks)


if __name__ == "__main__":
    main()
