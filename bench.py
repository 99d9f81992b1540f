"""Benchmark: RMP control steps/sec/chip on the flagship workload.

Workload (BASELINE.md north star): Franka Panda cluttered-environment scene
(franka/06: 14 policies = v2 stack + c-space bias + 10 collision frames x 7
cylinders), 4096 batched environments, full control step = sense (70 analytic
closest-point queries) -> stacked-jacfwd RMP evaluation -> resolve -> 10
semi-implicit Euler substeps.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 1e6 (the >=1M steps/s/chip target, BASELINE.json).
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def _source_fingerprint() -> str:
    """Conservative staleness key for AOT executable artifacts: hash of
    every rmp_tpu source file + bench.py + jax version + device kind. Any
    code change invalidates the artifact (fail-safe: worst case is one
    full recompile, never a silent measurement of stale code)."""
    import hashlib
    h = hashlib.sha256()
    root = os.path.dirname(os.path.abspath(__file__))
    for dirpath, dirnames, filenames in sorted(
            os.walk(os.path.join(root, "rmp_tpu"))):
        dirnames.sort()
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                h.update(fn.encode())
                with open(os.path.join(dirpath, fn), "rb") as f:
                    h.update(f.read())
    with open(os.path.join(root, "bench.py"), "rb") as f:
        h.update(f.read())
    h.update(jax.__version__.encode())
    h.update(jax.devices()[0].device_kind.encode())
    return h.hexdigest()[:12]


def main():
    # RMP_BENCH_CPU=1: force the CPU backend (for contract tests / machines
    # without the TPU). Must be jax.config, not the JAX_PLATFORMS env var —
    # the axon plugin ignores the env override (CLAUDE.md gotcha).
    if os.environ.get("RMP_BENCH_CPU", "0") == "1":
        jax.config.update("jax_platforms", "cpu")
    # Persistent compilation cache is OFF by default (RMP_BENCH_CACHE=1 to
    # enable): with scanned substeps the whole program builds in ~20-30s
    # (trace+lower ~18s, XLA ~4s), while persisting/loading the executable
    # through this host measured SLOWER than recompiling (populate 137s,
    # warm-load 72s vs 32s cold without persistence).
    if os.environ.get("RMP_BENCH_CACHE", "0") == "1":
        cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    batch = int(os.environ.get("RMP_BENCH_BATCH", "4096"))
    ticks = int(os.environ.get("RMP_BENCH_TICKS", "150"))
    reps = int(os.environ.get("RMP_BENCH_REPS", "3"))
    # steady-state measurement: each rep times a CHAIN of rollout dispatches
    # (final state threaded back in) with ONE block at the end. JAX dispatch
    # is async, so the ~30 ms fixed per-execution launch cost (axon tunnel
    # RPC + program launch — measured independent of tick count and aux
    # payload) overlaps with device execution, exactly as in a production
    # loop that dispatches continuously. chain=1 restores the old
    # block-per-call methodology (~20% lower at 150 ticks).
    chain = int(os.environ.get("RMP_BENCH_CHAIN", "16"))

    from rmp_tpu import envs

    # RMP_BENCH_ENV: bench any registered scenario (default: the flagship —
    # the driver's recorded metric). E.g. dual_panda/handover, franka/
    # randomized_cluttered, two_joint/05_obstacle_avoidance.
    env_name = os.environ.get("RMP_BENCH_ENV",
                              "franka/06_cluttered_environment")
    if env_name not in envs.REGISTRY:
        sys.exit(f"RMP_BENCH_ENV {env_name!r} not registered; "
                 f"see experiments/run.py --list")
    env = envs.make(env_name)
    # RMP_BENCH_GEOMETRY=hull benches the exact mesh-convex-hull GJK
    # collision mode (sub-mm distance parity; ~4x the collision-query cost)
    geometry = os.environ.get("RMP_BENCH_GEOMETRY", "capsule")
    if geometry not in ("capsule", "hull"):
        sys.exit(f"RMP_BENCH_GEOMETRY must be 'capsule' or 'hull', "
                 f"got {geometry!r}")
    env.collision_geometry = geometry
    # trace-time-unrolled pivoted-LU resolve: identical to pinv for
    # invertible systems, safe for the indefinite metrics the velocity-cap
    # band can produce, ~20x faster than lax.linalg at n=9 (the fused Pallas
    # path embeds the same solver)
    env.resolve_method = "solve"
    # substeps via lax.scan(unroll=True) by default: identical runtime code
    # to the Python-unrolled loop (5.13M steps/s both ways) but the body is
    # traced once, cutting client trace+lower from ~100-250s to ~18s.
    # RMP_BENCH_UNROLL=1 restores the Python-level unroll.
    env.unroll_substeps = os.environ.get("RMP_BENCH_UNROLL", "0") == "1"

    # RMP_BENCH_BLOCKS_DTYPE=bf16: cast the fused path's per-policy row
    # blocks to bfloat16 at the producer/Pallas-kernel boundary (arithmetic
    # and the LU resolve stay f32; ~1% qdd error — see
    # ops/pallas_resolve.pullback_resolve_structured). Default f32 keeps
    # the trajectory-parity path.
    blocks_dtype = os.environ.get("RMP_BENCH_BLOCKS_DTYPE", "f32")
    if blocks_dtype not in ("f32", "bf16"):
        sys.exit(f"RMP_BENCH_BLOCKS_DTYPE must be 'f32' or 'bf16', "
                 f"got {blocks_dtype!r}")
    if blocks_dtype == "bf16":
        env.fused_blocks_dtype = "bf16"

    params = env.gather_params()
    fused = os.environ.get("RMP_BENCH_FUSED", "1") == "1" and batch % 128 == 0
    # RMP_BENCH_TICK_UNROLL=k: scan-unroll k ticks per loop iteration —
    # XLA fuses across tick boundaries, which is the remaining axis in the
    # per-op-overhead regime (roofline: ~16% HBM peak). Measured same-chip
    # same-session: k=1 11.78M, k=2 13.14M, k=4 13.55M, k=8 13.62M
    # steps/s — k=4 is the default (nearly all of the win at half of k=8's
    # HLO growth / compile cost). Numerics are identical (scan unrolling,
    # not a program change; bit-match pinned by test_envs.py). Only the
    # FUSED rollout path reads the knob — force 1 (and say so) otherwise,
    # instead of silently reporting an unroll that never applied.
    tick_unroll = int(os.environ.get("RMP_BENCH_TICK_UNROLL", "4"))
    if not fused and tick_unroll != 1:
        print(f"note: RMP_BENCH_TICK_UNROLL={tick_unroll} ignored — the "
              f"non-fused rollout path has no tick-unroll "
              f"(RMP_BENCH_FUSED=0 or batch % 128 != 0)", file=sys.stderr)
        tick_unroll = 1
    states = envs.make_batched_reset(env, batch)(jax.random.PRNGKey(0))
    # with_aux=False: throughput consumers only read the final state; the
    # per-tick aux stacking + (T,B)->(B,T) transpose measured ~6% device time
    rollout_fn = envs.make_batched_rollout(env, ticks, fused_resolve=fused,
                                           with_aux=False,
                                           tick_unroll=tick_unroll)

    # Startup-cost anatomy (experiments/compile_probe_unroll.py, 4 fresh
    # idle-host runs of this exact program): trace ~4 s local CPU; LOWER
    # 1.3-625 s wall at <1 s local CPU — waiting on the remote axon
    # compile service, uncontrollable, two-plus orders of magnitude of
    # identical-program variance; XLA compile 7-270 s (also mostly
    # remote). BENCH_r03's 1412.6 s was that remote tail compounded by
    # host contention (single-core host: a concurrent process multiplies
    # the local trace stage ~40x, measured). Mitigation: RMP_BENCH_AOT=1
    # (default) loads a pickled COMPILED EXECUTABLE
    # (jax.experimental.serialize_executable): deserialize+load measured
    # 1.1 s with bit-identical steady-state throughput (717k vs 721k
    # steps/s on the b256 probe). Falls back to plain jit if the artifact
    # is missing or stale, then serializes it for the next run. NEGATIVE
    # RESULT, do not retry: jax.export (StableHLO) round-trip executed
    # the FUSED path ~300x slower on this stack (20-tick b256 rollout:
    # 0.45 s jit vs ~130 s reloaded; the non-Pallas path round-trips at
    # full speed) — the Mosaic custom calls do not survive re-lowering
    # through XlaCallModule with their performance intact.
    aot = os.environ.get("RMP_BENCH_AOT", "1") == "1"
    aot_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "assets", "aot")
    cfg = (f"{env_name.replace('/', '_')}-{geometry}-{blocks_dtype}-"
           f"b{batch}-t{ticks}-u{tick_unroll}-f{int(fused)}-"
           f"{jax.default_backend()}")
    # a stale executable would LOAD fine and silently measure OLD code, so
    # the artifact is keyed by a conservative fingerprint: any rmp_tpu
    # source change, jax upgrade, or device-kind change invalidates it
    aot_path = os.path.join(
        aot_dir, f"bench-{cfg}-{_source_fingerprint()}.rmpx")

    flat_in, treedef_in = jax.tree.flatten((states, params))
    flat_in = [jnp.asarray(x) for x in flat_in]
    # the rollout returns the ADVANCED state: same pytree structure as the
    # input states (the chain loop below relies on this anyway)
    out_treedef = jax.tree.structure(states)

    def flat_step(*leaves):
        s, p = jax.tree.unflatten(treedef_in, leaves)
        out, _ = rollout_fn(s, p)
        return tuple(jax.tree.leaves(out))

    stages = {}
    step = None
    compiled = None
    if aot and os.path.exists(aot_path):
        t0 = time.perf_counter()
        try:
            import pickle
            from jax.experimental import serialize_executable as se
            with open(aot_path, "rb") as f:
                payload, in_tree, out_tree = pickle.load(f)
            step = se.deserialize_and_load(payload, in_tree, out_tree)
            stages["aot_load_s"] = round(time.perf_counter() - t0, 1)
        except Exception as e:                      # stale jax/runtime
            print(f"note: AOT artifact load failed ({e!r}); "
                  f"falling back to jit", file=sys.stderr)
            step = None
    if step is None:
        jitted = jax.jit(flat_step)
        t0 = time.perf_counter()
        traced = jitted.trace(*flat_in)
        stages["trace_s"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        lowered = traced.lower()
        stages["lower_s"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        step = compiled = lowered.compile()
        stages["xla_compile_s"] = round(time.perf_counter() - t0, 1)

    n_state = len(jax.tree.leaves(states))

    def rollout(s, p):
        del p                      # params are baked into flat_in's tail
        leaves = jax.tree.leaves(s) + flat_in[n_state:]
        out_leaves = step(*leaves)
        return jax.tree.unflatten(out_treedef, out_leaves), None

    # warmup (first dispatch of the loaded/compiled executable)
    t0 = time.perf_counter()
    out, _ = rollout(states, params)
    # value fetch, not block_until_ready — see the timed loop below
    float(jnp.sum(jax.tree.leaves(out)[0]))
    stages["first_call_s"] = round(time.perf_counter() - t0, 1)
    compile_s = sum(stages.values())

    if aot and compiled is not None:
        # self-heal: persist the compiled executable so the NEXT run skips
        # trace + the noisy remote lower/compile stages entirely
        try:
            import pickle
            from jax.experimental import serialize_executable as se
            os.makedirs(aot_dir, exist_ok=True)
            payload, in_tree, out_tree = se.serialize(compiled)
            # drop artifacts for this config with an outdated fingerprint
            import glob
            for old in glob.glob(os.path.join(aot_dir,
                                              f"bench-{cfg}-*.rmpx")):
                if old != aot_path:
                    os.remove(old)
            with open(aot_path, "wb") as f:
                pickle.dump((payload, in_tree, out_tree), f)
            print(f"note: serialized executable -> {aot_path} "
                  f"({os.path.getsize(aot_path) / 1e6:.2f} MB)",
                  file=sys.stderr)
        except Exception as e:
            print(f"note: executable serialization failed ({e!r})",
                  file=sys.stderr)

    best = float("inf")
    for _ in range(reps):
        s = states
        t0 = time.perf_counter()
        for _ in range(chain):
            s, _ = rollout(s, params)
        # force a VALUE fetch, not just block_until_ready: on the remote
        # tunnel a block on an unread array was observed to under-wait in
        # some conditions (sub-ms "completions" of 100-tick rollouts);
        # reading a dependent scalar cannot be skipped
        float(jnp.sum(s.sim.q))
        best = min(best, time.perf_counter() - t0)

    control_steps_per_sec = batch * ticks * chain / best
    result = {
        "metric": "rmp_control_steps_per_sec_per_chip",
        "value": round(control_steps_per_sec, 1),
        "unit": f"control_steps/s/chip ({env_name}, "
                f"{geometry} geometry, "
                + (f"bf16 row blocks, " if blocks_dtype == "bf16" else "")
                + f"{batch} envs, {ticks} ticks x{chain} chained; "
                f"startup {compile_s:.1f}s = "
                + " + ".join(f"{k[:-2]} {v}s" for k, v in stages.items())
                + f"; platform {jax.devices()[0].platform})",
        "vs_baseline": round(control_steps_per_sec / 1_000_000.0, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
