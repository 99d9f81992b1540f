"""Shared stall/budget/maneuver substrate for the randomized envs.

franka/randomized_cluttered and dual_panda/randomized_clutter both carry
in-graph behavioral machinery — stall counters, maneuver timers with
budgets and end-on-arrival, clearance-scored detour waypoints, the
final-push gain boost, spent-budget fast timeouts — that acts BEFORE the
goal-timeout resample so first-goal credit is preserved. Round 4 grew two
~30-key copies of that substrate with subtly different knob names
(VERDICT r4 #6/#7); this module is the single implementation both envs
(and any third consumer) parameterize.

Everything here is shape-polymorphic over a leading "arm" axis: franka
passes scalars, dual passes (2,) vectors, and the same jnp expressions
broadcast. All knobs are TRACED per-env scalars living in
EnvState.scratch["cfg"] (see cfg_scratch), so config grids share one
compiled rollout — the property experiments/sweep_escape.py exploits for
paired one-compile sweeps.

Unified knob vocabulary (r5; the per-env CFG dicts select a subset):
  man_budget      maneuvers per goal (0 disables; was esc_budget / budget)
  man_ticks       maneuver duration in control ticks (was esc_ticks)
  man_arrive      1: end a maneuver on waypoint arrival (was esc_arrive)
  man_first_only  1: maneuvers only before the first goal event
  esc_trigger     stalled ticks before a solo escape detour
  timeout         stalled ticks before the goal resamples
  timeout_spent   faster resample once the maneuver budget is spent
  push_trigger / push_near / push_boost / push_relax
                  final-push boost on near-miss stalls (shared names)

No reference counterpart: the reference has no stuck handling at all (its
flagship hand-tunes scenes until they solve, 06_cluttered_environment.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def cfg_scratch(cfg: dict) -> dict:
    """CFG dict -> traced f32 scalars for EnvState.scratch['cfg']."""
    return {k: jnp.asarray(v, jnp.float32) for k, v in cfg.items()}


def point_clearance(obstacles, p: Array, seed: Array | None = None) -> Array:
    """Min signed distance from point p (3,) to every obstacle axis segment
    (capsule metric — cylinders are scored by their bounding capsule, which
    is conservative and monotone, all a waypoint score needs).

    seed: optional scalar to initialize the running minimum (e.g. distance
    to the other arm's EE); None starts from the first obstacle. The
    reduction is a where-chain, not jnp.min over a stacked axis — the
    closest-primitive reduction measured 6x faster that way
    (sim/collision.py; CLAUDE.md perf history)."""
    seg = obstacles.p1 - obstacles.p0                            # (K, 3)
    seg_len2 = jnp.einsum("kc,kc->k", seg, seg)
    t = jnp.clip(jnp.einsum("kc,kc->k", p[None] - obstacles.p0, seg)
                 / (seg_len2 + 1e-12), 0.0, 1.0)
    foot = obstacles.p0 + t[:, None] * seg
    d = jnp.linalg.norm(p[None] - foot, axis=-1) - obstacles.radius
    out = d[0] if seed is None else jnp.minimum(seed, d[0])
    for k in range(1, d.shape[0]):
        out = jnp.minimum(out, d[k])
    return out


def score_candidates(cands, goal: Array, clearance_fn,
                     clearance_cap: float = 0.12,
                     detour_weight: float = 0.35):
    """Pick the best detour waypoint from a static candidate list.

    Score = min(clearance_fn(c), cap) - detour_weight * |c - goal|: beyond
    `cap` more clearance stops mattering, and a candidate INTO another
    obstacle or straight away from the goal never wins. Returns
    (best_candidate, best_score) via a where-chain (static list, fused
    selects — same rationale as envs/base.take_row)."""
    best_c = cands[0]
    best_s = -jnp.inf
    for c in cands:
        s = (jnp.minimum(clearance_fn(c), clearance_cap)
             - detour_weight * jnp.linalg.norm(c - goal))
        take = s > best_s
        best_c = jnp.where(take, c, best_c)
        best_s = jnp.maximum(best_s, s)
    return best_c, best_s


def budget_free(cfg: dict, timer: Array, count: Array, phase: Array) -> Array:
    """True where a new maneuver may fire: no maneuver in flight and budget
    remaining. The budget is PER GOAL PHASE (count resets on goal events):
    `man_budget` before the first goal event (phase == 0), and afterwards
    `man_budget_late` when man_first_only is set (0 = the old hard gate)
    or the full `man_budget` when it isn't. The split exists because the
    r5 round-13 sweep showed late-goal escapes are ~free with arrival-
    ended detours (r4's -8.9 overall was the old timer-parked detours),
    but sharing ONE budget across all goals starves the first goal."""
    late = jnp.where(cfg["man_first_only"] > 0.5,
                     cfg.get("man_budget_late", 0.0), cfg["man_budget"])
    allowed = jnp.where(phase == 0, cfg["man_budget"], late)
    return (timer == 0) & (count < allowed)


def maneuver_timers(cfg: dict, timer: Array, count: Array, trigger: Array,
                    ee: Array, wp_old: Array, wp_new: Array,
                    arrive_tol: float):
    """Shared timer/budget/arrival bookkeeping for one tick.

    end-on-arrival (man_arrive=1): a maneuver that reached its waypoint
    (|ee - wp| < arrive_tol) has done its job — the timer zeroes so the
    goal chase resumes instead of parking out the clock. Broadcasts over a
    leading arm axis (timer/count/trigger (A,), ee/wp (A, 3)) and over
    scalars (franka). Returns (timer_next, count_next, wp_next)."""
    arrived = ((timer > 0) & (cfg["man_arrive"] > 0.5)
               & (jnp.linalg.norm(ee - wp_old, axis=-1) < arrive_tol))
    dec = jnp.where(arrived, 0, jnp.maximum(timer - 1, 0))
    timer_next = jnp.where(trigger, cfg["man_ticks"].astype(jnp.int32), dec)
    count_next = count + trigger.astype(jnp.int32)
    wp_next = jnp.where(trigger[..., None], wp_new, wp_old)
    return timer_next, count_next, wp_next


def spent_timeout(cfg: dict, count: Array, phase: Array | None = None) -> Array:
    """Per-goal stall window: the full `timeout` while maneuvers remain,
    `timeout_spent` once the phase's budget is used up (a goal that
    survived every maneuver is hopeless — don't also make it wait out the
    full window). A zero budget (maneuvers disabled for the phase) must
    NOT count as pre-spent. `phase` selects the late budget after the
    first goal event (None keeps the pre-r5.13 first-goal-only shape)."""
    allowed = cfg["man_budget"]
    if phase is not None:
        late = jnp.where(cfg["man_first_only"] > 0.5,
                         cfg.get("man_budget_late", 0.0), cfg["man_budget"])
        allowed = jnp.where(phase == 0, cfg["man_budget"], late)
    # a phase with maneuvers DISABLED (allowed == 0) keeps the old
    # count >= man_budget rule: an arm that spent its budget earlier and
    # was never resampled still deserves the fast window (the certified
    # r5 defaults were measured under this semantics)
    thresh = jnp.where(allowed > 0, allowed, cfg["man_budget"])
    spent = (cfg["man_budget"] > 0) & (count >= thresh)
    return jnp.where(spent, cfg["timeout_spent"], cfg["timeout"])


def push_engaged(cfg: dict, no_progress: Array, best: Array) -> Array:
    """Final-push predicate: stalled push_trigger ticks AND the env has
    been within push_near of the goal — a near-miss force equilibrium just
    outside tolerance, not a deep local minimum (the detour's job)."""
    return (no_progress >= cfg["push_trigger"]) & (best < cfg["push_near"])


def scaled_attractor(prm: dict, goal: Array | None = None,
                     gain_boost=1.0, metric_scale=1.0) -> dict:
    """Attractor params with the shared boost shape: p-gain scales by
    `gain_boost`, d-gain by its sqrt (keeps the damping ratio), and both
    metric scalars by `metric_scale`."""
    prm = dict(prm)
    if goal is not None:
        prm["goal"] = goal
    prm["accel_p_gain"] = prm["accel_p_gain"] * gain_boost
    prm["accel_d_gain"] = prm["accel_d_gain"] * jnp.sqrt(gain_boost)
    prm["max_metric_scalar"] = prm["max_metric_scalar"] * metric_scale
    prm["min_metric_scalar"] = prm["min_metric_scalar"] * metric_scale
    return prm


def relaxed_obstacle(prm: dict, relax_repulsion, relax_metric) -> dict:
    """Obstacle-avoidance params with repulsion_gain / metric_scalar
    divided by the given (traced) factors — 1.0 is identity."""
    return dict(prm,
                repulsion_gain=prm["repulsion_gain"] / relax_repulsion,
                metric_scalar=prm["metric_scalar"] / relax_metric)


def freeze_progress(state, trigger_any: Array, timer_any: Array):
    """Reset the GLOBAL progress window while a maneuver fires or runs:
    the outbound leg can't improve the true-goal distance by construction,
    and letting it count would spend the whole retry budget on transit.
    Returns (no_progress, goal_best) replacements."""
    no_progress = jnp.where(trigger_any | timer_any, 0, state.no_progress)
    goal_best = jnp.where(trigger_any, jnp.inf, state.goal_best)
    return no_progress, goal_best
