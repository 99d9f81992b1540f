"""Trace-based per-op device-time report for the flagship rollout.

experiments/profile_tick.py times stages as STANDALONE jits, which inflates
their cost (each materializes outputs the fused rollout never writes). This
tool is the honest attribution: run a short rollout under jax.profiler,
parse the perfetto trace, and aggregate device time by (fusion-)op name.

Usage: python experiments/trace_report.py [--batch 4096] [--ticks 20] [--top 25]
"""
import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def load_trace_events(trace_dir):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    events = []
    for p in paths:
        with gzip.open(p, "rt") as f:
            events.extend(json.load(f).get("traceEvents", []))
    return events


def device_op_durations(events):
    """{op_name: total_us} for complete events on device 'XLA Ops' threads
    (the per-op track; summing all device tracks would double-count ops
    inside their parent module events)."""
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    device_pids = {pid for pid, name in pid_names.items()
                   if any(k in name.lower() for k in ("tpu", "device", "xla"))
                   and "host" not in name.lower()}
    op_tracks = {(e["pid"], e["tid"]) for e in events
                 if e.get("ph") == "M" and e.get("name") == "thread_name"
                 and e.get("pid") in device_pids
                 and "xla ops" in e["args"].get("name", "").lower()}
    totals = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_tracks:
            name = e.get("name", "?")
            if name.startswith("while"):
                continue   # loop parents double-count their body ops
            totals[name] += e.get("dur", 0)
    if not totals:      # fallback: no 'XLA Ops' metadata — use all device
        for e in events:
            if e.get("ph") == "X" and e.get("pid") in device_pids:
                totals[e.get("name", "?")] += e.get("dur", 0)
    return totals


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--ticks", type=int, default=20)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from rmp_tpu import envs

    env = envs.make("franka/06_cluttered_environment")
    env.resolve_method = "solve"
    env.unroll_substeps = False
    params = env.gather_params()
    states = envs.make_batched_reset(env, args.batch)(jax.random.PRNGKey(0))
    rollout = jax.jit(envs.make_batched_rollout(env, args.ticks,
                                                fused_resolve=True))
    out = rollout(states, params)           # compile outside the trace
    jax.block_until_ready(out[0].sim.q)

    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            out = rollout(states, params)
            jax.block_until_ready(out[0].sim.q)
        totals = device_op_durations(load_trace_events(td))

    dev_total = sum(totals.values())
    n_steps = args.batch * args.ticks
    print(f"device time {dev_total / 1e3:.2f} ms for {args.ticks} ticks x "
          f"{args.batch} envs -> {n_steps / (dev_total / 1e6):,.0f} steps/s "
          f"(device-bound estimate)")
    print(f"{'device op (fusion)':60s} {'us':>10s}  share")
    for name, us in totals.most_common(args.top):
        print(f"{name[:60]:60s} {us:10.0f}  {us / dev_total:6.1%}")


if __name__ == "__main__":
    main()
