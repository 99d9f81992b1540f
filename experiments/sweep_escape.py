"""One-compile sweep of the stuck-escape / yield / final-push knobs.

franka/randomized_cluttered and dual_panda/randomized_clutter keep their
behavioral-machinery knobs in EnvState.scratch["cfg"] as TRACED per-env
scalars, so a whole grid of configs evaluates inside ONE compiled rollout:
the batch is split into groups, each group's cfg leaves overridden after
reset, and first-goal / overall success + final penetration reported per
group. 512+ envs per group gives ~±2.2% binomial noise — rank here,
certify the winner at 4096 envs via experiments/evaluate.py.

Evaluation is PAIRED: every config sees the SAME batch of scenes (cfg
leaves are overridden uniformly and the rollout re-dispatched — same
compiled program, no retrace), so config deltas are measured against
identical task draws instead of disjoint env groups (group-to-group scene
noise measured ~±3% at 512 envs/group, swamping few-point effects).

Usage: python experiments/sweep_escape.py [--env NAME]
           [--batch 4096] [--ticks 300]
"""
import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np

# env -> {config name -> cfg OVERRIDES (unlisted keys keep env defaults)}
CONFIGS = {
    "franka/randomized_cluttered": {
        # paired round 5: SCORED candidate waypoints + end-on-arrival
        # (round 4 found a near-constant first+overall frontier ~171 —
        # time reallocation, not creation; these two aim at detour
        # QUALITY/efficiency. Round-4 numbers: relax4 nogate 82.6/88.8,
        # gate15 80.9/90.2, gate+spent30 79.2/91.0)
        # round 7: c-space re-posing during detours (round 6: every
        # gate/budget/boost refinement of cand_arrive was a pure trade;
        # residual failures are 58% >=10 cm stalls — wedged CONFIGURATIONS
        # the EE-space detour doesn't unwedge). cand_arrive (= the new
        # env defaults) anchors.
        # round 8 (r5) RESULTS — IK-consistent q-space detours (esc_qspace
        # =1) measured FLAT-to-NEGATIVE (c5 83.2/89.6, c15 81.4/89.1, c40
        # 82.5/89.7 vs baseline 83.1/89.5 at pen 1.07) and the metric-only
        # push relax HURT penetration on franka (pm_only 82.6/89.3/1.32)
        # — opposite sign vs dual.
        # round 9 (r5) RESULTS — REVERSE-OUT escapes (esc_qspace=2, detour
        # to the arm's own ~32-tick-old pose) measured NEGATIVE across the
        # whole grid: c10 80.2/90.1, c30 78.4/90.3, c80 78.4/89.7,
        # c30_b3 79.7/86.0, c30_long 78.5/90.1, c30_spent35 75.7/90.1,
        # c30_eager 78.0/90.9 vs baseline 83.1/89.5/1.07. The 32-tick
        # history is INSIDE the 35-tick stall window — the "old" pose is
        # already wedged — and deeper history means retreating most of the
        # way to spawn, spending the horizon. The q-space detour family
        # (mode 1 IK re-pose, mode 2 reverse-out) is a measured dead end.
        # Round 10: GEOMETRY probe (VERDICT r4 #2 lever b) — obs_margin
        # shifts the obstacle policy's effective distance (+1 cm padding
        # emulation removal); the exact-hull tier (same scenes, exact
        # distances) already sits at 85.9 first-goal / 0.29 pen.
        # round 10 (r5) RESULTS — geometry-conservatism probe: NEGATIVE
        # margins buy little first-goal (+0.4..1.0) at exploding measured
        # penetration (m5 83.5/90.1/1.59, m10 83.6/90.1/2.12, m15
        # 84.1/89.7/3.17) — the wedged class is NOT the ~1 cm capsule
        # padding. POSITIVE +5 mm margin is a freebie on the pen axis:
        # 83.0/89.5/0.76 (from 1.07) at unchanged success. trig45 (mixed
        # with m10) hit first-goal 85.1/89.0 — later detours give the
        # plain policy longer. Round 11: esc_trigger timing alone/with
        # +5 mm margin, and metric-only obstacle relax DURING detours
        # (esc_relax — the barrier metric may be blocking the escape
        # direction itself for wedged links).
        # round 11 (r5) RESULTS: esc_relax FLAT (er4 83.0/89.7, er10
        # 83.2/89.7 vs 83.1/89.5 — the barrier-metric-blocks-the-escape
        # hypothesis doesn't fire); trig45 is a trade (84.6/88.3);
        # trig45_p5 84.0/88.0/0.88; er10_trig45_p5 84.4/88.4/0.83 — the
        # best pen<=1.0 sum so far (172.8). Also measured this round:
        # the 47-primitive FINE capsule set at defaults is FLAT
        # (83.2/89.3/1.29 vs 83.1/89.5/1.07) — geometry fidelity is not
        # the capsule-tier lever; the hull tier's +2.4 first-goal comes
        # from exactness beyond any capsule count.
        # round 12 (r5) RESULTS: er10_t40_p5 84.1/89.0/0.85 maximizes
        # first+overall at pen<=1.0 and SHIPS as the env defaults
        # (esc_trigger=40, esc_relax=10, obs_margin=+0.005);
        # er10_t45_p5 84.4/88.4/0.83, side40 84.5/88.1/0.78, boost4
        # 84.2/88.0, p10 83.5/87.8, spent40 83.8/88.3, tmo70 84.4/88.4.
        # After 12 paired rounds (60+ configs, 6 mechanism families, 2
        # geometry interventions) the first+overall frontier tops out at
        # ~173 on this tier — the 85/92 pair demands 177 and is beyond
        # every measured mechanism; the exact-hull tier reaches it.
        # NOTE: cand_arrive here now reflects the r4 defaults only if the
        # overrides below are applied; with the r5 defaults shipped, the
        # anchor IS er10_t40_p5.
        # round 13 (r5) RESULTS: late-goal escapes are no longer the r4
        # disaster (allgoals_b2 84.1/88.8 vs shipped 84.1/89.0 — the
        # arrival-ended detours made them ~free) and a SHARED single
        # budget lifts overall at first-goal cost (allgoals_b1 79.9/91.5/
        # 0.76 — the budget starves the first goal). Trigger dial is flat
        # (t38 83.3/89.0, t42 84.1/89.2). Round 14: SPLIT budgets —
        # man_budget_late gives keep-busy goals their own allowance while
        # the first goal keeps its full 2.
        # round 14 (r5) RESULTS — split budgets are FLAT: late1/late2
        # 84.1/88.8 vs shipped 84.1/89.0 (late1_spent40 83.2/89.2,
        # late1_t42 84.1/89.1). Late-goal escapes CREATE nothing; round
        # 13's allgoals_b1 overall lift (91.5) came from the first goal
        # having only ONE detour — i.e. spending less horizon on it —
        # not from late rescues. Fixed-horizon time reallocation,
        # exactly the frontier. man_budget_late stays a knob, default 0.
        "cand_arrive": dict(esc_trigger=35.0, esc_relax=1.0,
                            obs_margin=0.0),
        "shipped": dict(),
        "first_b1": dict(man_budget=1.0),
        "late1": dict(man_budget_late=1.0),
    },
    "dual_panda/randomized_clutter": {
        # round 8 (r5): PER-ARM obstacle split (VERDICT r4 #6) — the
        # obstacle policy is split per arm so push_relax applies only to
        # the pushing arm; push_relax_global=1 reproduces round 4's
        # global relax for the paired baseline. Question: overall >= 90
        # at pen <= 0.5% while first-goal stays >= 70.
        # round 8 (r5) RESULTS: perarm 70.2/86.6/0.51 (pen 0.71->0.51 vs
        # r4_global 70.5/87.1/0.71 at equal success — the split works);
        # perarm_pm 68.6/85.6/0.54, perarm_pm_relax4 69.9/86.4/0.66,
        # perarm_relax4 69.6/85.6/1.42, perarm_b1 65.5/89.7/0.61,
        # perarm_pm_b1 64.2/89.1/0.34, perarm_pm_eager 66.7/87.0/0.44.
        # The first-vs-overall frontier persists under the split.
        # Round 10: franka round-10/11 levers ported — positive obs_margin
        # (pen freebie on franka), man_relax (maneuver-time metric-only
        # relax), faster spent-budget reassignment.
        # round 10 (r5) RESULTS: mrelax4 is flat on success at a pen
        # freebie (70.2/86.6/0.44 vs perarm 70.2/86.6/0.51) and SHIPS as
        # the default (man_relax=4). POSITIVE margins hurt dual (p5
        # 67.1/84.7/0.46, p10 64.2/82.5/0.34 — opposite sign vs franka:
        # the shared workspace is too tight for extra conservatism);
        # spent35 trades first for nothing (63.8/86.3); mrelax4_p5_b1
        # 62.4/87.9/0.32 is the overall-leaning frontier end. The
        # 90/70/0.5 triple: 70/0.5 met at 86.6 overall; 90 overall is
        # beyond the measured frontier at first>=70.
        # round 11 (r5) RESULTS — late-goal yield budgets are NEGATIVE on
        # dual too (late1 70.2/84.4, late2 70.2/83.0 vs shipped
        # 70.2/86.3-86.6): late maneuvers DELAY the per-arm timeout
        # reassignments that actually rescue overall (freeze_progress
        # resets the stall window every maneuver). The late-budget family
        # is closed on both envs; shipped defaults final.
        "perarm_r4": dict(man_relax=1.0),
        "shipped": dict(),
        "shipped_b1": dict(man_budget=1.0),
        "shipped_spent35": dict(timeout_spent=35.0),
    },
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="franka/randomized_cluttered",
                    choices=sorted(CONFIGS))
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--ticks", type=int, default=300)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # persistent compile cache: cfg knobs are traced, so successive sweep
    # ROUNDS in fresh processes reuse one compiled rollout (~70 s load vs
    # 10-15 min remote compile) as long as the env code didn't change
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   os.pardir, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from rmp_tpu import envs
    from rmp_tpu.models import kinematics as K
    from rmp_tpu.sim.collision import robot_obstacle_distances

    env = envs.make(args.env)
    configs = CONFIGS[args.env]
    states0 = envs.make_batched_reset(env, args.batch)(
        jax.random.PRNGKey(args.seed))

    fused = args.batch % 128 == 0 and not args.cpu
    rollout = jax.jit(envs.make_batched_rollout(env, args.ticks,
                                                fused_resolve=fused))
    params = env.gather_params()

    @jax.jit
    @jax.vmap
    def min_clearance(sim):
        T_all = K.fk_all(env.model, sim.q)
        _, _, _, d = robot_obstacle_distances(env.model, T_all,
                                              sim.obstacles)
        return jnp.min(d)

    report = {"env": args.env, "batch": args.batch, "ticks": args.ticks,
              "paired": True, "groups": {}}
    for name, overrides in configs.items():
        cfg = dict(states0.scratch["cfg"])
        for key, val in overrides.items():
            cfg[key] = jnp.full_like(cfg[key], val)
        states = dataclasses.replace(
            states0, scratch=dict(states0.scratch, cfg=cfg))
        t0 = time.perf_counter()
        final, aux = rollout(states, params)
        jax.block_until_ready(final.sim.q)
        wall = time.perf_counter() - t0

        sol = np.asarray(aux["solved"])
        ev = np.asarray(aux["resample"])
        has_ev = ev.any(axis=1)
        first_ev = ev.argmax(axis=1)
        first_goal = has_ev & sol[np.arange(len(sol)), first_ev]
        pen = np.asarray(min_clearance(final.sim)) < -0.01
        report["groups"][name] = dict(
            first_goal=round(float(first_goal.mean()), 4),
            overall=round(float(sol.any(axis=1).mean()), 4),
            penetration=round(float(pen.mean()), 4),
            wall_s=round(wall, 1))
        print(f"{name}: {report['groups'][name]}", flush=True)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
