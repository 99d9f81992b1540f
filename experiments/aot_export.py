"""AOT export of the compiled control step — the serving-artifact story.

A deployed controller should not pay Python tracing (~18 s client-side for
the flagship rollout) or the remote compile service's 0-130 s noise at
robot boot. jax.export serializes the traced + lowered StableHLO to a
self-contained artifact; the serving host deserializes and calls it with
plain arrays — no rmp_tpu import, no env registry, no Python retracing —
paying only local XLA compilation for its chip (cached across boots by the
persistent compile cache).

The exported callable is FLAT: f(*leaves) -> leaves, so the consumer needs
no rmp_tpu pytree registrations. A JSON manifest next to the artifact
records input/output shapes+dtypes, the env name, and which platforms the
artifact lowers for (--platforms tpu,cpu exports one artifact serving
both). State round-trips through the same leaf list, so a serving loop is:

    exp = jax.export.deserialize(open('step.rmpx','rb').read())
    leaves = [np.load(...)...]        # initial state + params, manifest order
    while True:
        leaves[:n_state] = exp.call(*leaves)[..]   # one control tick

Usage:
  python experiments/aot_export.py --save step.rmpx [--env NAME] [--batch N]
      [--ticks 1] [--platforms cpu,tpu] [--cpu]
  python experiments/aot_export.py --load step.rmpx [--cpu]   # smoke-run
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def export_step(env_name: str, batch: int, ticks: int,
                platforms: list[str] | None):
    """(serialized_bytes, manifest): a flat-calling-convention export of
    make_batched_rollout(env, ticks, with_aux=False) plus the shape/dtype
    manifest a consumer needs to build inputs."""
    import jax
    from jax import export as jexport

    from rmp_tpu import envs

    env = envs.make(env_name)
    env.resolve_method = "solve"
    # the fused Pallas path needs lane-width batches AND a tpu-only export;
    # keep the portable XLA path unless the artifact is tpu-only
    fused = batch % 128 == 0 and platforms == ["tpu"]
    states = envs.make_batched_reset(env, batch)(jax.random.PRNGKey(0))
    params = env.gather_params()
    rollout = envs.make_batched_rollout(env, ticks, fused_resolve=fused,
                                        with_aux=False)

    args = (states, params)
    flat, treedef = jax.tree.flatten(args)
    # param leaves include Python scalars (gains); the artifact's calling
    # convention is plain arrays, so coerce once here (all-f32 math anyway)
    flat = [jax.numpy.asarray(x) for x in flat]

    def flat_step(*leaves):
        s, p = jax.tree.unflatten(treedef, leaves)
        out, _ = rollout(s, p)
        return tuple(jax.tree.leaves(out))

    exp = jexport.export(jax.jit(flat_step), platforms=platforms)(
        *[jax.ShapeDtypeStruct(x.shape, x.dtype) for x in flat])
    n_state = len(jax.tree.leaves(states))
    manifest = {
        "env": env_name,
        "batch": batch,
        "ticks_per_call": ticks,
        "platforms": list(exp.platforms),
        "fused_resolve": fused,
        "inputs": [{"shape": list(x.shape), "dtype": str(x.dtype)}
                   for x in flat],
        # the first n_state inputs are the state leaves; the call returns
        # the advanced state leaves in the same order (feed them back in)
        "n_state_leaves": n_state,
        "n_param_leaves": len(flat) - n_state,
        "outputs": [{"shape": list(x.shape), "dtype": str(x.dtype)}
                    for x in exp.out_avals],
    }
    return exp.serialize(), manifest, flat


def smoke_run(path: str) -> dict:
    """Deserialize an artifact and run one call from the manifest alone —
    exactly what a serving host without rmp_tpu would do."""
    import time

    from jax import export as jexport

    with open(path, "rb") as f:
        exp = jexport.deserialize(f.read())
    with open(path + ".json") as f:
        manifest = json.load(f)
    example = np.load(path + ".npz")
    leaves = [example[f"arr_{i}"] for i in range(len(example.files))]
    t0 = time.perf_counter()
    out = exp.call(*leaves)
    out = [np.asarray(o) for o in out]
    first_call_s = time.perf_counter() - t0
    n_state = manifest["n_state_leaves"]
    assert len(out) == n_state, (len(out), n_state)
    for o, spec in zip(out, manifest["outputs"]):
        assert list(o.shape) == spec["shape"], (o.shape, spec)
    # some state leaves are non-finite by design (goal_best starts at inf);
    # require finiteness only where the input leaf was finite
    finite = all(np.all(np.isfinite(o))
                 for o, i in zip(out, leaves)
                 if np.issubdtype(np.asarray(o).dtype, np.floating)
                 and np.all(np.isfinite(i)))
    # closed loop: feed the advanced state back in
    leaves2 = list(out) + leaves[n_state:]
    t0 = time.perf_counter()
    out2 = [np.asarray(o) for o in exp.call(*leaves2)]
    warm_call_s = time.perf_counter() - t0
    moved = any(not np.array_equal(a, b) for a, b in zip(out, out2))
    return {"path": path, "env": manifest["env"],
            "platforms": manifest["platforms"],
            "first_call_s": round(first_call_s, 3),
            "warm_call_s": round(warm_call_s, 4),
            "outputs_finite": bool(finite), "state_advances": bool(moved)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--save", default=None, help="write artifact here")
    ap.add_argument("--load", default=None, help="smoke-run an artifact")
    ap.add_argument("--env", default="franka/06_cluttered_environment")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--ticks", type=int, default=1,
                    help="control ticks per exported call")
    ap.add_argument("--platforms", default=None,
                    help="comma-separated lowering platforms (e.g. "
                         "'cpu,tpu' for one artifact serving both); "
                         "default: the current backend only")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if args.load:
        print(json.dumps(smoke_run(args.load), indent=2))
        return
    if not args.save:
        sys.exit("need --save PATH or --load PATH")
    platforms = args.platforms.split(",") if args.platforms else None
    data, manifest, example = export_step(args.env, args.batch, args.ticks,
                                          platforms)
    with open(args.save, "wb") as f:
        f.write(data)
    with open(args.save + ".json", "w") as f:
        json.dump(manifest, f, indent=2)
        f.write("\n")
    # example inputs (initial reset state + params) so the consumer can
    # boot without rmp_tpu; arr_i order == manifest inputs order
    np.savez(args.save + ".npz", *[np.asarray(x) for x in example])
    print(f"exported {args.env} ({manifest['platforms']}, "
          f"{args.batch} envs, {args.ticks} tick(s)/call) -> {args.save} "
          f"({len(data) / 1e6:.2f} MB + manifest + example inputs)")


if __name__ == "__main__":
    main()
