"""Train a learned (MLP) RMP attractor end-to-end through the physics.

The leaf is rmp_tpu.policies.neural.neural_attractor — an MLP that maps
(goal - x, xd) to a bounded task-space acceleration and a Cholesky-factored
PSD metric. Because the whole control stack (FK -> taskmaps -> pullback/
resolve -> integrator) is differentiable, the net trains with jax.grad of a
rollout loss over a batch of RANDOM goals; the hand-designed v1 target
policy (reference rmp.py:226-261) on the same goals is the printed yardstick.
Structurally impossible in the reference: PyBullet's C++ stepSimulation
blocks gradients.

Usage: python experiments/train_neural_rmp.py [--steps 60] [--batch 128]
           [--ticks 50] [--cpu] [--remat] [--save weights.npz]
           [--ckpt train.ckpt [--resume] [--stop-after N]]

Checkpoint/resume: --ckpt writes an atomic training checkpoint (net +
optimizer state incl. the lr-schedule step + best-loss iterate) every
--ckpt-every steps; --resume continues a run bit-exactly
(tests/test_neural.py::test_trainer_checkpoint_resume_equivalence), and
--stop-after N time-slices a long schedule across invocations.

The BPTT landscape (gradients through T ticks x 10 chained substeps) is
multi-modal and seed-sensitive: at 256 envs x 80 ticks x 250 steps, seed 0
plateaus at ~0.40 m mean final distance while seeds 1/2 fully solve the
task (0.6-5 mm, 97-100% at the 2 cm tolerance). Run a few seeds and keep
the best (the committed asset is seed 1's best-loss iterate).
"""
import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np

from rmp_tpu.envs.neural_reach import make_neural_env  # noqa: E402,F401
# (the env builder lives in rmp_tpu.envs.neural_reach so the trained asset
# registers as a first-class scenario, two_joint/neural_reach)


def make_loss(env, batch: int, n_ticks: int, seed: int = 0,
              remat: bool = False):
    """loss(net) + metrics over a fixed batch of random-goal episodes."""
    from rmp_tpu import envs as envs_mod

    states = envs_mod.make_batched_reset(env, batch)(jax.random.PRNGKey(seed))
    rollout = envs_mod.make_batched_rollout(env, n_ticks, remat=remat)
    base = env.gather_params()

    dims = 2 if env.solved_xy_only else 3

    def metrics(net):
        params = (dict(base[0], net=net),) + tuple(base[1:])
        final, aux = rollout(states, params)
        # dense loss: distance over the SECOND HALF of the trajectory (a
        # final-tick-only loss is sparse — long-horizon runs plateau on a
        # goal-independent policy), plus terminal-velocity + effort shaping
        d_traj = jnp.linalg.norm(
            aux["ee"][..., :dims] - final.sim.goal[:, None, :dims], axis=-1)
        d_final = d_traj[:, -1]
        qd_final = jnp.linalg.norm(final.sim.qd, axis=-1)
        effort = jnp.mean(aux["qdd"] ** 2)
        loss = jnp.mean(d_traj[:, d_traj.shape[1] // 2:]) \
            + 0.05 * jnp.mean(qd_final ** 2) + 1e-4 * effort
        return loss, dict(mean_final_dist=jnp.mean(d_final),
                          solved=jnp.mean((d_final < env.solved_tol)
                                          .astype(jnp.float32)))

    return (lambda net: metrics(net)[0]), metrics, states, base


def hand_designed_yardstick(env, states, n_ticks: int):
    """Same episodes under the reference-parity v1 target policy (same
    EE-position taskmap object as the neural leaf)."""
    from rmp_tpu import envs as envs_mod
    from rmp_tpu.envs.base import bind_goal
    from rmp_tpu.policies import v1

    ref_pol = (v1.target_policy(goal=[0.0, 0.0, 0.0],
                                taskmap=env.policies[0].taskmap,
                                alpha=0.1, beta=0.5, c=0.1, name="target"),
               env.policies[1])
    ref_env = dataclasses.replace(env, policies=ref_pol,
                                  bind_params=bind_goal(("target",)))
    rollout = envs_mod.make_batched_rollout(ref_env, n_ticks)
    final, aux = jax.jit(rollout)(states, ref_env.gather_params())
    dims = 2 if env.solved_xy_only else 3
    d = jnp.linalg.norm(aux["ee"][:, -1, :dims] - final.sim.goal[:, :dims],
                        axis=-1)
    return float(jnp.mean(d)), float(jnp.mean(
        (d < env.solved_tol).astype(jnp.float32)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--ticks", type=int, default=50)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--clip", type=float, default=1.0,
                    help="global-norm gradient clip (BPTT through T ticks "
                         "x 10 substeps explodes without it on long "
                         "horizons; 0 disables)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--robot", choices=("two_joint", "franka"),
                    default="two_joint")
    ap.add_argument("--hidden", type=int, nargs="+", default=[32, 32],
                    help="MLP hidden layer widths")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--remat", action="store_true",
                    help="jax.checkpoint the tick (long-horizon training)")
    ap.add_argument("--save", default=None, help="save trained net (.npz)")
    ap.add_argument("--ckpt", default=None,
                    help="training checkpoint file (net + optimizer state "
                         "+ best iterate), written atomically every "
                         "--ckpt-every steps and at the end")
    ap.add_argument("--ckpt-every", type=int, default=25)
    ap.add_argument("--resume", action="store_true",
                    help="continue from --ckpt if it exists (the lr "
                         "schedule resumes in place via the optimizer's "
                         "step count)")
    ap.add_argument("--stop-after", type=int, default=0,
                    help="stop this invocation after N optimizer steps "
                         "while keeping the full --steps lr schedule "
                         "(time-sliced training; resume with --resume)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import optax

    env = make_neural_env(jax.random.PRNGKey(args.seed), robot=args.robot,
                          hidden=tuple(args.hidden))
    loss, metrics, states, base = make_loss(env, args.batch, args.ticks,
                                            seed=args.seed, remat=args.remat)
    net = base[0]["net"]

    ref_d, ref_solved = hand_designed_yardstick(env, states, args.ticks)
    print(f"hand-designed v1 target policy: mean_final_dist {ref_d:.4f} m, "
          f"solved {ref_solved:.1%}")

    vg = jax.jit(jax.value_and_grad(loss))
    eval_metrics = jax.jit(lambda n: metrics(n)[1])
    # hold-then-decay: constant lr through the first 60% (the loss landscape
    # is multi-modal — decaying from step 0 measured locking into an early
    # 0.8 m basin), cosine anneal over the rest to settle the oscillation
    hold = int(args.steps * 0.6)
    sched = optax.join_schedules(
        [optax.constant_schedule(args.lr),
         optax.cosine_decay_schedule(args.lr, max(args.steps - hold, 1),
                                     alpha=0.05)], [hold])
    opt = optax.adam(sched) if args.clip <= 0 else optax.chain(
        optax.clip_by_global_norm(args.clip), optax.adam(sched))
    opt_state = opt.init(net)
    # keep the best-loss weights: BPTT through 10*T chained substeps is a
    # chaotic landscape (late steps can jump basins even at decayed lr), so
    # the final iterate is not the best one
    best_val, best_net = float("inf"), net
    start = 0
    if args.ckpt and args.resume and os.path.exists(args.ckpt):
        from rmp_tpu.utils.checkpoint import restore_train_checkpoint
        start, net, opt_state, best_val, best_net = \
            restore_train_checkpoint(args.ckpt, net, opt_state)
        print(f"resumed {args.ckpt} at step {start}")
    for step in range(start, args.steps):
        val, grad = vg(net)
        if float(val) < best_val:
            best_val, best_net = float(val), net
        updates, opt_state = opt.update(grad, opt_state)
        net = optax.apply_updates(net, updates)
        if step % 10 == 0 or step == args.steps - 1:
            m = eval_metrics(net)
            print(f"step {step:4d}  loss {float(val):.4f}  "
                  f"mean_final_dist {float(m['mean_final_dist']):.4f} m  "
                  f"solved {float(m['solved']):.1%}")
        done = step + 1
        if args.ckpt and (done % args.ckpt_every == 0 or done == args.steps
                          or done - start == args.stop_after):
            from rmp_tpu.utils.checkpoint import save_train_checkpoint
            save_train_checkpoint(args.ckpt, done, net, opt_state,
                                  best_val, best_net)
        if args.stop_after and done - start >= args.stop_after:
            print(f"stopping after {args.stop_after} steps "
                  f"(at step {done}/{args.steps})")
            return

    # the loop scores each net BEFORE its update — evaluate the final
    # iterate too so the last step's net can be selected as best
    val = vg(net)[0]
    if float(val) < best_val:
        best_val, best_net = float(val), net

    m = eval_metrics(best_net)
    print(f"best: loss {best_val:.4f}  "
          f"mean_final_dist {float(m['mean_final_dist']):.4f} m  "
          f"solved {float(m['solved']):.1%}  "
          f"(vs hand-designed {ref_d:.4f} m)")
    if args.save:
        np.savez(args.save, **{k: np.asarray(v) for k, v in best_net.items()})
        print(f"saved best net -> {args.save}")


if __name__ == "__main__":
    main()
