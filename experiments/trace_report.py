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


def _op_track_events(events):
    """Complete events on device 'XLA Ops' threads (the per-op track;
    summing all device tracks would double-count ops inside their parent
    module events). Loop parents ('while...') are dropped for the same
    reason. Falls back to all device-pid events if no track metadata."""
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
    out = [e for e in events
           if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_tracks
           and not e.get("name", "").startswith("while")]
    if not out:         # fallback: no 'XLA Ops' metadata — use all device
        out = [e for e in events
               if e.get("ph") == "X" and e.get("pid") in device_pids]
    return out


_REPO_PREFIX = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            os.pardir) + os.sep


def device_source_durations(events):
    """{source_file:line: total_us} using the profiler's per-op `source`
    metadata (jax lowering locations) — attribution straight to repo code.
    Ops with no source (infrastructure copies/reshapes XLA introduced) are
    bucketed under their hlo_category."""
    totals = collections.Counter()
    for e in events:
        a = e.get("args", {})
        src = a.get("source") or f"<{a.get('hlo_category', 'unattributed')}>"
        src = src.replace(_REPO_PREFIX, "")
        totals[src] += e.get("dur", 0)
    return totals


def device_op_durations(events):
    """{op_name: total_us} on the per-op device track."""
    totals = collections.Counter()
    for e in events:
        totals[e.get("name", "?")] += e.get("dur", 0)
    return totals


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--ticks", type=int, default=20)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--by-source", action="store_true",
                    help="aggregate by jax source location instead of op name")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--geometry", choices=("capsule", "hull"),
                    default="capsule")
    ap.add_argument("--env", default="franka/06_cluttered_environment")
    ap.add_argument("--tick-unroll", type=int, default=4,
                    help="tick-scan unroll factor (bench default: 4)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from rmp_tpu import envs

    env = envs.make(args.env)
    env.resolve_method = "solve"
    env.unroll_substeps = False
    env.collision_geometry = args.geometry
    params = env.gather_params()
    states = envs.make_batched_reset(env, args.batch)(jax.random.PRNGKey(0))
    rollout = jax.jit(envs.make_batched_rollout(
        env, args.ticks, fused_resolve=True, tick_unroll=args.tick_unroll))
    import contextlib
    interp = contextlib.nullcontext()
    if args.cpu:
        from jax.experimental.pallas import tpu as pltpu
        interp = pltpu.force_tpu_interpret_mode()

    with interp:
        # AOT-compile ONCE and execute the compiled object: the roofline's
        # cost_analysis reads from this same compilation instead of paying a
        # second trace+lower+remote-compile (the axon tunnel adds 0-130 s of
        # noise per compile, CLAUDE.md).
        compiled = rollout.lower(states, params).compile()
        out = compiled(states, params)      # warm-up outside the trace
        jax.block_until_ready(out[0].sim.q)

        with tempfile.TemporaryDirectory() as td:
            with jax.profiler.trace(td):
                out = compiled(states, params)
                jax.block_until_ready(out[0].sim.q)
            events = _op_track_events(load_trace_events(td))
        totals = (device_source_durations(events) if args.by_source
                  else device_op_durations(events))

    dev_total = sum(totals.values())
    n_steps = args.batch * args.ticks
    if dev_total == 0:
        print("no device op events in trace (CPU backends expose no "
              "'XLA Ops' track) — use this tool on TPU")
        return
    print(f"device time {dev_total / 1e3:.2f} ms for {args.ticks} ticks x "
          f"{args.batch} envs -> {n_steps / (dev_total / 1e6):,.0f} steps/s "
          f"(device-bound estimate)")

    # roofline note (VERDICT r2 #7): XLA cost analysis of the whole rollout
    # vs v5e peaks — tells us whether remaining wins are bandwidth, compute,
    # or per-op overhead. (Pallas kernel flops are not counted by XLA; the
    # kernel is ~10% of device time, so the MFU figure is a mild
    # underestimate.)
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        bts = float(ca.get("bytes accessed", 0.0))
        dev_s = dev_total / 1e6
        hbm_peak = 819e9          # v5e HBM GB/s
        vpu_peak = 197e12 / 2     # v5e bf16 MXU peak / 2 ~ fp32; VPU is far
                                  # lower — this workload is VPU+HBM bound
        print(f"roofline: {flops:.3e} flops, {bts:.3e} bytes accessed -> "
              f"{flops / dev_s / 1e12:.3f} TFLOP/s "
              f"({flops / dev_s / vpu_peak:.2%} of fp32 MXU peak), "
              f"{bts / dev_s / 1e9:.0f} GB/s "
              f"({bts / dev_s / hbm_peak:.1%} of HBM peak) — "
              f"{'bandwidth' if bts / dev_s / hbm_peak > 0.5 else 'per-op overhead/latency'}"
              f"-dominated regime")
    except Exception as e:                       # cost analysis is advisory
        print(f"(roofline unavailable: {e})")
    print(f"{'device op (fusion)':60s} {'us':>10s}  share")
    for name, us in totals.most_common(args.top):
        print(f"{name[:60]:60s} {us:10.0f}  {us / dev_total:6.1%}")


if __name__ == "__main__":
    main()
