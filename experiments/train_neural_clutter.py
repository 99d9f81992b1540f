"""Train the learned obstacle-avoidance leaf through the cluttered physics.

The leaf (policies/neural.neural_obstacle) shares the production v2
attractor/damping stack and the grouped per-pair distance taskmap of
franka/randomized_cluttered; only the obstacle leaf's MLP trains. The loss
balances goal reaching against a dense collision hinge over the full
per-pair distance matrix (Env.aux_fn), so gradients flow both through the
policy's effect on the trajectory AND directly from every near-obstacle
tick. The hand-designed v2 ObstacleAvoidance (reference rmp2.py:140-196,
retuned per reports/eval_randomized.json) on the same episodes is the
printed yardstick. Structurally impossible in the reference: PyBullet's
C++ stepSimulation blocks gradients.

Usage: python experiments/train_neural_clutter.py [--steps 300]
           [--batch 1024] [--ticks 100] [--cpu] [--save weights.npz]
           [--ckpt train.ckpt [--resume] [--stop-after N]]

Checkpoint/resume: same contract as train_neural_rmp.py — --ckpt writes an
atomic checkpoint (net + optimizer state + best iterate) every --ckpt-every
steps, --resume continues in place, --stop-after time-slices a schedule.
"""
import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np

from rmp_tpu.envs.neural_clutter import (clearance_aux,  # noqa: E402
                                         make_neural_clutter_env)


def episode_metrics(env, states, rollout, params, clear_margin: float,
                    pen_margin: float = 0.005):
    """Common scoring for the learned env and the hand-designed yardstick."""
    final, aux = rollout(states, params)
    d_traj = jnp.linalg.norm(aux["ee"] - final.sim.goal[:, None, :], axis=-1)
    # dense reach loss over the SECOND HALF (final-tick-only is sparse and
    # plateaus, see train_neural_rmp.py), plus TWO collision terms on every
    # (tick, link, obstacle) distance, plus effort. The collision pressure
    # is SPLIT so the optimizer — not a hand-set margin — trades success
    # against safety (VERDICT r3 #4): a light proximity hinge below
    # clear_margin provides shaping gradient before contact, and a separate
    # heavy penetration hinge below pen_margin (just above the evaluate.py
    # -1 cm threshold) prices actual contact. One blended hinge at 5 cm
    # taxed every close-quarters maneuver the same as a collision, which
    # is exactly the over-conservatism that kept the round-3 asset at
    # 92.1% success.
    reach = jnp.mean(d_traj[:, d_traj.shape[1] // 2:])
    hinge = jnp.maximum(clear_margin - aux["obst_d"], 0.0)   # (B,T,L,K)
    collision = jnp.mean(jnp.sum(hinge * hinge, axis=(-2, -1)))
    pen_h = jnp.maximum(pen_margin - aux["obst_d"], 0.0)
    penetration = jnp.mean(jnp.sum(pen_h * pen_h, axis=(-2, -1)))
    effort = jnp.mean(aux["qdd"] ** 2)
    min_clear = jnp.min(aux["obst_d"], axis=(-2, -1))        # (B, T)
    d_final = d_traj[:, -1]
    mets = dict(
        mean_final_dist=jnp.mean(d_final),
        solved=jnp.mean((d_final < env.solved_tol).astype(jnp.float32)),
        # an env "penetrated" if ANY tick dipped below -1 cm (the
        # evaluate.py threshold, applied per-tick rather than final-state)
        penetrated=jnp.mean((jnp.min(min_clear, axis=-1) < -0.01)
                            .astype(jnp.float32)),
        mean_min_clear=jnp.mean(min_clear))
    return reach, collision, penetration, effort, mets


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--ticks", type=int, default=100)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--clip", type=float, default=1.0)
    ap.add_argument("--env-clip", type=float, default=3.0,
                    help="per-env gradient norm clip, applied before the "
                         "batch mean (non-finite env grads are dropped)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--hidden", type=int, nargs="+", default=[32, 32])
    ap.add_argument("--w-collision", type=float, default=10.0,
                    help="proximity hinge weight (squared hinge below "
                         "--clear-margin, summed over pairs) — light "
                         "shaping pressure, NOT the safety term")
    ap.add_argument("--clear-margin", type=float, default=0.05)
    ap.add_argument("--w-pen", type=float, default=300.0,
                    help="penetration hinge weight (squared hinge below "
                         "--pen-margin) — the heavy term that prices "
                         "actual contact; the optimizer trades it "
                         "against reach instead of a hand-set blend")
    ap.add_argument("--pen-margin", type=float, default=0.005)
    ap.add_argument("--w-effort", type=float, default=1e-4)
    ap.add_argument("--barrier", action="store_true",
                    help="structural near-contact authority variant "
                         "(repulsion boost + 1/x metric exploder)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--save", default=None)
    ap.add_argument("--ckpt", default=None,
                    help="training checkpoint file (net + optimizer state "
                         "+ best iterate), written atomically every "
                         "--ckpt-every steps and at the end")
    ap.add_argument("--ckpt-every", type=int, default=25)
    ap.add_argument("--resume", action="store_true",
                    help="continue from --ckpt if it exists")
    ap.add_argument("--stop-after", type=int, default=0,
                    help="stop this invocation after N optimizer steps "
                         "while keeping the full --steps lr schedule "
                         "(time-sliced training; resume with --resume)")
    ap.add_argument("--init-from", default=None,
                    help="warm-start the net from an .npz asset (e.g. the "
                         "committed neural_clutter_franka.npz) instead of "
                         "the transparent init — fine-tuning mode")
    ap.add_argument("--select", choices=("loss", "task"), default="loss",
                    help="best-iterate criterion: 'loss' = lowest training "
                         "(or fixed-eval, with --resample-every) loss; "
                         "'task' = highest solved - penetrated on the "
                         "fixed eval batch. The r5 unconstrained run "
                         "showed 'loss' picks a timid early iterate "
                         "(solved 0.13 at loss 0.296) over the final one "
                         "(solved 0.51) — low collision terms dominate "
                         "before the attractor is outvoted at all")
    ap.add_argument("--resample-every", type=int, default=0,
                    help="redraw the TRAINING episode batch every N steps "
                         "(fresh randomized scenes; the printed eval "
                         "metrics stay on the fixed seed set). 0 = train "
                         "on one fixed batch (the round-3 recipe)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import optax

    from rmp_tpu import envs as envs_mod

    from rmp_tpu.policies.neural import mlp_init, transparent_obstacle_init
    from rmp_tpu.policies import neural as neural_mod
    if args.init_from:
        # ADVICE r4: skip the transparent init entirely (it was computed
        # then discarded, and --hidden was silently ignored), and flag the
        # head-variant footgun — the committed barrier asset's weights are
        # interpreted differently under the unconstrained head.
        from rmp_tpu.envs.neural_clutter import load_trained_net
        net_init = load_trained_net(args.init_from)
        print(f"warm-started net from {args.init_from} "
              f"(--hidden ignored; shapes come from the asset)")
        if not args.barrier:
            print("WARNING: fine-tuning without --barrier — if the asset "
                  "was trained with the barrier head its weights will be "
                  "re-interpreted under the unconstrained head")
    else:
        net_init = transparent_obstacle_init(mlp_init(
            jax.random.PRNGKey(args.seed),
            (neural_mod.OBSTACLE_FEATURES, *args.hidden, 2)))
    env = make_neural_clutter_env(net=net_init, hidden=tuple(args.hidden),
                                  train=True, barrier=args.barrier)
    reset_fn = envs_mod.make_batched_reset(env, args.batch)
    states = reset_fn(jax.random.PRNGKey(args.seed))
    # remat: BPTT through ticks x 10 substeps at this batch size needs the
    # rematerialized scan (54959bc) to fit HBM
    rollout = envs_mod.make_batched_rollout(env, args.ticks, remat=True)
    base = env.gather_params()
    net0 = base[-1]["net"]
    obstacle_slot = len(base) - 1

    def metrics(net):
        params = base[:obstacle_slot] + (dict(base[obstacle_slot], net=net),)
        reach, collision, penetration, effort, mets = episode_metrics(
            env, states, rollout, params, args.clear_margin, args.pen_margin)
        loss = (reach + args.w_collision * collision
                + args.w_pen * penetration + args.w_effort * effort)
        return loss, dict(mets, reach=reach, collision=collision,
                          pen_loss=penetration)

    # yardstick: the production hand-designed obstacle leaf on the SAME
    # episodes (same reset keys; identical attractor stack and scoring)
    from rmp_tpu.envs import franka
    hand_env = dataclasses.replace(
        franka.env_randomized_cluttered(), on_solved=None, stuck_fn=None,
        aux_fn=clearance_aux)
    hand_rollout = envs_mod.make_batched_rollout(hand_env, args.ticks,
                                                 remat=True)
    _, _, _, _, hand = jax.jit(
        lambda: episode_metrics(hand_env, states, hand_rollout,
                                hand_env.gather_params(),
                                args.clear_margin, args.pen_margin))()
    print("hand-designed yardstick: "
          + "  ".join(f"{k} {float(v):.4f}" for k, v in hand.items()))

    # PER-ENV gradients, clipped per env BEFORE the batch mean. BPTT
    # through the stiff closed loop (velocity-cap near-singular metric,
    # obstacle repulsion) EXPLODES on a heavy tail of envs — measured
    # gnorm 1.2 at 5 ticks -> 9.7e3 at 20 -> inf/NaN at 100 — and a batch-
    # mean gradient lets one diverged env poison the shared net (both
    # whole-batch attempts froze: NaN params at step 1, then all-NaN
    # gradients every step). vmap(grad) isolates each episode: non-finite
    # env gradients are dropped, finite ones norm-clipped to --env-clip,
    # and only then averaged.
    single_rollout = envs_mod.make_rollout(env, args.ticks, remat=True)

    def env_loss(net, state):
        p = base[:obstacle_slot] + (dict(base[obstacle_slot], net=net),)
        f, a = single_rollout(state, p)
        d_traj = jnp.linalg.norm(a["ee"] - f.sim.goal[None, :], axis=-1)
        reach = jnp.mean(d_traj[d_traj.shape[0] // 2:])
        hinge = jnp.maximum(args.clear_margin - a["obst_d"], 0.0)
        collision = jnp.mean(jnp.sum(hinge * hinge, axis=(-2, -1)))
        pen_h = jnp.maximum(args.pen_margin - a["obst_d"], 0.0)
        penetration = jnp.mean(jnp.sum(pen_h * pen_h, axis=(-2, -1)))
        effort = jnp.mean(a["qdd"] ** 2)
        return (reach + args.w_collision * collision
                + args.w_pen * penetration + args.w_effort * effort)

    def vg(net, train_states):
        vals, grads = jax.vmap(jax.value_and_grad(env_loss),
                               in_axes=(None, 0))(net, train_states)
        leaf_ok = [jnp.all(jnp.isfinite(g), axis=tuple(range(1, g.ndim)))
                   for g in jax.tree.leaves(grads)]
        ok = jnp.stack(leaf_ok, axis=0).all(axis=0) & jnp.isfinite(vals)
        norms = jnp.sqrt(sum(
            jnp.sum(jnp.where(jnp.isfinite(g), g, 0.0) ** 2,
                    axis=tuple(range(1, g.ndim)))
            for g in jax.tree.leaves(grads)))                    # (B,)
        scale = jnp.where(ok, jnp.minimum(1.0, args.env_clip
                                          / (norms + 1e-12)), 0.0)
        n_ok = jnp.maximum(jnp.sum(ok.astype(jnp.float32)), 1.0)
        grad = jax.tree.map(
            lambda g: jnp.einsum(
                "b...,b->...", jnp.where(jnp.isfinite(g), g, 0.0), scale)
            / n_ok, grads)
        gnorm = jnp.sqrt(sum(jnp.sum(g * g) for g in jax.tree.leaves(grad)))
        val = jnp.sum(jnp.where(ok, vals, 0.0)) / n_ok
        return val, grad, gnorm, 1.0 - n_ok / vals.shape[0]

    vg = jax.jit(vg)
    eval_loss_metrics = jax.jit(metrics)
    hold = int(args.steps * 0.6)
    sched = optax.join_schedules(
        [optax.constant_schedule(args.lr),
         optax.cosine_decay_schedule(args.lr, max(args.steps - hold, 1),
                                     alpha=0.05)], [hold])
    opt = optax.adam(sched) if args.clip <= 0 else optax.chain(
        optax.clip_by_global_norm(args.clip), optax.adam(sched))
    net = net0
    opt_state = opt.init(net)
    best_val, best_net = float("inf"), net
    start = 0
    if args.ckpt and args.resume and os.path.exists(args.ckpt):
        from rmp_tpu.utils.checkpoint import restore_train_checkpoint
        start, net, opt_state, best_val, best_net = \
            restore_train_checkpoint(args.ckpt, net, opt_state)
        print(f"resumed {args.ckpt} at step {start}")
    train_states = states
    if args.resample_every and start:
        # ADVICE r4: a resumed run must train on the batch the
        # uninterrupted run would have — the one drawn at the last
        # resample boundary, not the seed-0 fixed batch
        last = (start // args.resample_every) * args.resample_every
        if last:
            train_states = reset_fn(jax.random.PRNGKey(
                (args.seed + 1) * 100003 + last))

    def consider_best(step, best_val, best_net):
        """ADVICE r4: with --resample-every, per-step training losses are
        not comparable across batches (the 'best' iterate was just the
        net that saw an easy batch) — select on the FIXED eval batch.
        --select task scores solved - penetrated instead (negated so
        lower is still better)."""
        ev, m = eval_loss_metrics(net)
        score = (float(m["penetrated"]) - float(m["solved"])
                 if args.select == "task" else float(ev))
        if score < best_val:
            return score, net, m
        return best_val, best_net, m

    for step in range(start, args.steps):
        if args.resample_every and step and step % args.resample_every == 0:
            train_states = reset_fn(jax.random.PRNGKey(
                (args.seed + 1) * 100003 + step))
        val, grad, gnorm, dropped = vg(net, train_states)
        if (args.select == "loss" and not args.resample_every
                and float(val) < best_val):
            best_val, best_net = float(val), net
        updates, opt_state = opt.update(grad, opt_state)
        net = optax.apply_updates(net, updates)
        if step % 10 == 0 or step == args.steps - 1:
            if args.resample_every or args.select == "task":
                best_val, best_net, m = consider_best(step, best_val,
                                                      best_net)
            else:
                m = eval_loss_metrics(net)[1]
            print(f"step {step:4d}  loss {float(val):.4f}  "
                  f"gnorm {float(gnorm):.2e}  dropped {float(dropped):.3f}  "
                  + "  ".join(f"{k} {float(v):.4f}" for k, v in m.items()))
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

    if args.resample_every or args.select == "task":
        best_val, best_net, _ = consider_best(args.steps, best_val, best_net)
    else:
        val = vg(net, train_states)[0]
        if float(val) < best_val:
            best_val, best_net = float(val), net

    m = eval_loss_metrics(best_net)[1]
    print("best: loss %.4f  " % best_val
          + "  ".join(f"{k} {float(v):.4f}" for k, v in m.items()))
    if args.save:
        np.savez(args.save, **{k: np.asarray(v) for k, v in best_net.items()})
        print(f"saved best net -> {args.save}")


if __name__ == "__main__":
    main()
