"""Measure fresh-compile time vs steady-state throughput for bench variants.

VERDICT r1 #2: the 150-tick flagship rollout costs ~106 s of fresh compile
(unrolled substeps make a large tick body). This probe times trace+lower,
compile, and steady-state throughput for:

  A  unrolled substeps, fused Pallas resolve          (bench default r1)
  B  lax.scan substeps, fused Pallas resolve          (compile-lean candidate)
  C  A + donated EnvState buffers                     (headroom probe r1 #8)

Run on the TPU (exclusive!): python experiments/compile_probe.py
Persistent cache is NOT used — numbers are true fresh-compile costs.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax


def probe(name, unroll, donate, batch, ticks, reps=2):
    from rmp_tpu import envs

    env = envs.make("franka/06_cluttered_environment")
    env.resolve_method = "solve"
    env.unroll_substeps = unroll
    params = env.gather_params()
    states = envs.make_batched_reset(env, batch)(jax.random.PRNGKey(0))
    fn = envs.make_batched_rollout(env, ticks, fused_resolve=True)
    jfn = jax.jit(fn, donate_argnums=(0,) if donate else ())

    t0 = time.perf_counter()
    lowered = jfn.lower(states, params)
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()

    best = float("inf")
    out_states = states
    for _ in range(reps + 1):  # first call includes any lazy init
        t3 = time.perf_counter()
        out_states, aux = compiled(out_states if donate else states, params)
        jax.block_until_ready(out_states.sim.q)
        best = min(best, time.perf_counter() - t3)

    res = dict(variant=name, unroll_substeps=unroll, donate=donate,
               lower_s=round(t1 - t0, 1), compile_s=round(t2 - t1, 1),
               steps_per_sec=round(batch * ticks / best),
               best_wall_s=round(best, 3))
    print(json.dumps(res), flush=True)
    return res


def main():
    batch = int(os.environ.get("RMP_BENCH_BATCH", "4096"))
    ticks = int(os.environ.get("RMP_BENCH_TICKS", "150"))
    print(f"platform={jax.devices()[0].platform} batch={batch} ticks={ticks}",
          flush=True)
    probe("A_unrolled", unroll=True, donate=False, batch=batch, ticks=ticks)
    probe("B_scan_substeps", unroll=False, donate=False, batch=batch,
          ticks=ticks)
    probe("C_unrolled_donate", unroll=True, donate=True, batch=batch,
          ticks=ticks)


if __name__ == "__main__":
    main()
