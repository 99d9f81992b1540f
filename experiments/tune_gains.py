"""Gradient-based policy-gain tuning through the differentiable rollout.

The whole control stack — FK, taskmaps, policies, pullback/resolve, and the
physics integrator — is jvp/vjp-safe, so batched rollouts are differentiable
end-to-end with respect to policy gains. This was structurally impossible in
the reference (gradients cannot flow through PyBullet's C++ stepSimulation);
here it is a one-liner: jax.grad of a rollout loss.

Demo: tune the TargetAttractor's p/d gains (log-space) to minimize the mean
final EE-to-goal distance plus an effort penalty on franka/01.

Usage: python experiments/tune_gains.py [--steps 30] [--batch 16] [--cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np


def make_loss(env, batch: int, n_ticks: int, seed: int = 0,
              remat: bool = False):
    from rmp_tpu import envs as envs_mod

    states = envs_mod.make_batched_reset(env, batch)(jax.random.PRNGKey(seed))
    # remat: O(ticks x state) activation memory instead of
    # O(ticks x tick-graph) -- enables gradient tuning over long horizons
    rollout = envs_mod.make_batched_rollout(env, n_ticks, remat=remat)
    base_params = env.gather_params()
    # which policy holds the attractor gains (first policy in these envs)
    gain_keys = ("accel_p_gain", "accel_d_gain") \
        if "accel_p_gain" in base_params[0] else ("alpha", "beta")

    def loss(theta):
        prm = dict(base_params[0])
        prm[gain_keys[0]] = jnp.exp(theta["log_p"])
        prm[gain_keys[1]] = jnp.exp(theta["log_d"])
        params = (prm,) + tuple(base_params[1:])
        final, aux = rollout(states, params)
        d_final = jnp.linalg.norm(aux["ee"][:, -1] - final.sim.goal, axis=-1)
        effort = jnp.mean(aux["qdd"] ** 2)
        return jnp.mean(d_final) + 1e-3 * effort

    init = {"log_p": jnp.log(jnp.asarray(
                float(base_params[0][gain_keys[0]]))),
            "log_d": jnp.log(jnp.asarray(
                float(base_params[0][gain_keys[1]])))}
    return loss, init, gain_keys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="franka/01_target_rmp_only")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--ticks", type=int, default=60)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--lr", type=float, default=0.1)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--remat", action="store_true",
                    help="jax.checkpoint the tick (long-horizon tuning)")
    ap.add_argument("--geometry", choices=("capsule", "hull"),
                    default="capsule",
                    help="link collision geometry (hull = exact mesh-hull "
                         "GJK; differentiable via support_hull's envelope "
                         "custom_jvp)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import optax

    from rmp_tpu import envs

    env = envs.make(args.env)
    env.collision_geometry = args.geometry
    env.resolve_method = "cholesky"
    env.on_solved = None          # keep the goal fixed while tuning
    loss, theta, keys = make_loss(env, args.batch, args.ticks,
                                  remat=args.remat)
    value_and_grad = jax.jit(jax.value_and_grad(loss))

    opt = optax.adam(args.lr)
    opt_state = opt.init(theta)
    for step in range(args.steps):
        val, grad = value_and_grad(theta)
        updates, opt_state = opt.update(grad, opt_state)
        theta = optax.apply_updates(theta, updates)
        if step % 5 == 0 or step == args.steps - 1:
            print(f"step {step:3d}  loss {float(val):.4f}  "
                  f"{keys[0]} {float(jnp.exp(theta['log_p'])):.4f}  "
                  f"{keys[1]} {float(jnp.exp(theta['log_d'])):.4f}")
    print("tuned gains:",
          {keys[0]: float(jnp.exp(theta["log_p"])),
           keys[1]: float(jnp.exp(theta["log_d"]))})


if __name__ == "__main__":
    main()
