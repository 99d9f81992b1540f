"""Environment machinery: reference experiments as batched, jittable envs.

The reference's experiments (experiments/*/0*.py) are imperative scripts:
  per control tick (10 Hz): state() -> Datamanager.update -> core.evaluate,
  then 10 physics steps at 100 Hz, plus host-side goal/robot resampling when
  a tolerance check fires.

Here each experiment is an `Env`: a pure `step(env_state, params)` that runs
ONE control tick (sense -> combined RMP evaluation -> `control_every`
integrator substeps with the latched q̈, exactly the reference's loop
structure) plus in-graph solved-checking and resampling. Envs vmap over
thousands of states and shard over device meshes (parallel/).
"""
from __future__ import annotations

import dataclasses
import weakref
from typing import Callable

import jax
import jax.numpy as jnp

from rmp_tpu.core import evaluate_policies
from rmp_tpu.models import kinematics as K
from rmp_tpu.models.urdf import KinematicModel
from rmp_tpu.policies.base import Policy
from rmp_tpu.sim.world import SimState, physics_step, sense

Array = jax.Array


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class EnvState:
    """Carried rollout state: sim + PRNG + bookkeeping (all traced)."""

    sim: SimState
    key: Array
    steps: Array          # control ticks taken (i32)
    solved_count: Array   # number of goals reached (i32)
    phase: Array          # env-specific phase/goal index (i32)
    # temporal GJK warm start for the batched hull tier: previous-tick
    # witness directions (L, K, 3) per env, or None outside hull rollouts.
    # Seeded with zeros (= cold capsule-witness start) by
    # make_batched_rollout; carried tick-to-tick so the kernel runs
    # RMP_GJK_ITERS (warm) instead of 10 (cold) iterations.
    gjk_warm: Array | None = None
    # PROGRESS tracking for stuck detection (maintained by _advance when
    # env.stuck_fn is set): best EE-goal distance since the last goal
    # event, and ticks since that distance last improved by more than
    # env.progress_eps. Catches both parked arms AND limit-cycle
    # oscillation in a local minimum (a pure near-zero-velocity test
    # missed oscillating envs entirely — success ~= first-goal success in
    # the r2 sweeps, i.e. resampling almost never rescued anyone).
    goal_best: Array | None = None     # f32, +inf after each event
    no_progress: Array | None = None   # i32 ticks without improvement
    # env-PRIVATE per-env state (any pytree, None by default so envs that
    # don't use it add zero carry leaves): escape timers/waypoints, per-arm
    # progress counters, ... — maintained by the env's pre_tick hook and
    # read by its (state-aware) bind_params/stuck_fn/on_solved.
    scratch: object = None

    def tree_flatten(self):
        return ((self.sim, self.key, self.steps, self.solved_count,
                 self.phase, self.gjk_warm, self.goal_best,
                 self.no_progress, self.scratch), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        del aux
        return cls(*children)


def env_state(sim: SimState, key: Array, scratch=None) -> EnvState:
    zero = jnp.zeros((), jnp.int32)
    return EnvState(sim=sim, key=key, steps=zero, solved_count=zero,
                    phase=zero, goal_best=jnp.asarray(jnp.inf, jnp.float32),
                    no_progress=zero, scratch=scratch)


@dataclasses.dataclass
class Env:
    """One experiment scenario.

    reset(key) -> EnvState; the step function comes from make_control_step.
    on_solved(env_state) -> env_state handles the experiment's resampling
    behavior (new goal / new robot config / next goal in sequence) in-graph.
    bind_params(params, sim) injects state-carried quantities (the current
    goal) into policy params each tick.
    """

    name: str
    model: KinematicModel
    policies: tuple[Policy, ...]
    reset: Callable[[Array], EnvState]
    ee_frame: int
    dt: float = 0.01
    control_every: int = 10
    solved_tol: float = 0.02
    solved_xy_only: bool = False
    resolve_method: str = "pinv"
    derivatives: str = "analytic"
    torque_mode: bool = False
    on_solved: Callable[[EnvState], EnvState] | None = None
    bind_params: Callable[[tuple, SimState], tuple] | None = None
    check_velocity: float | None = None   # also require |q̇| < this
    # context_fn(model, sim, T_all) -> per-frame ctx dict; T_all is the tick's
    # precomputed world transforms (F, 4, 4) or None (recompute via fk_all)
    context_fn: Callable[..., dict] | None = None
    unroll_substeps: bool = True
    # divergence guard: clamp |q̈| and zero non-finite commands (needed for
    # domain-randomized scenes where obstacles can spawn in deep penetration)
    max_qdd: float | None = None
    # contact dynamics (sim/contact.py): penalty forces at penetrating
    # closest points, applied through the torque-level physics path
    contact: bool = False
    # scene dynamics: fn(sim) -> sim applied once per control tick (moving
    # obstacles, conveyor goals, ...)
    update_scene: Callable[[SimState], SimState] | None = None
    # link collision geometry for the distance context: 'capsule' (fitted
    # multi-capsule, default) or 'hull' (exact mesh-convex-hull GJK --
    # PyBullet-equivalent distances at ~4x the collision-query cost;
    # requires a hull asset for the robot, models/hulls.py)
    collision_geometry: str = "capsule"
    # custom solved predicate fn(env, sim) -> bool array; None = default
    # single-EE goal check (multi-goal scenes, e.g. dual-arm, need their own)
    is_solved_fn: Callable | None = None
    # clamp q-dot to the model's URDF velocity limits each substep. OFF by
    # default (PyBullet doesn't enforce URDF velocity limits under torque
    # control — parity); ON for randomized scenes where deep-penetration
    # spawns can kick unphysical transients
    enforce_velocity_limits: bool = False
    # optional stuck predicate fn(env_state) -> bool: when true, on_solved
    # fires WITHOUT incrementing solved_count (goal-timeout resampling for
    # randomized sweeps — reactive RMPs have local minima, and an env stuck
    # behind an obstacle would otherwise stay stuck forever)
    stuck_fn: Callable | None = None
    # optional per-tick hook fn(env_state) -> env_state, applied at the
    # START of every control tick (per env, before policy evaluation).
    # Envs use it for in-graph behavioral machinery that acts BEFORE the
    # stuck_fn goal timeout: escape-maneuver timers, dual-arm yielding,
    # phase schedules. It must NOT touch sim.q/qd (the tick's FK/distance
    # context would silently disagree in the fused batched path) and must
    # NOT move sim.goal to a temporary target (the solved predicate reads
    # sim.goal — bind the detour through a state-aware bind_params instead).
    pre_tick: Callable[["EnvState"], "EnvState"] | None = None
    # EE-goal improvement (m) that counts as progress for the
    # EnvState.no_progress counter stuck_fn implementations consume
    progress_eps: float = 0.01
    # custom scalar goal distance fn(env, sim) -> f32 for the progress
    # bookkeeping above; None = |EE - goal| (multi-goal scenes, e.g.
    # dual-arm, need their own — the default broadcasts wrongly there)
    goal_distance_fn: Callable | None = None
    # opt-in extra per-tick aux: fn(model, sim) -> dict merged into the
    # tick's aux after the substeps (training losses that need signals the
    # default aux lacks, e.g. min obstacle clearance for collision-shaped
    # objectives). None (default) costs nothing.
    aux_fn: Callable | None = None
    # hull tier only: warm-tick GJK iteration count for THIS env's batched
    # rollouts (None = the global RMP_GJK_ITERS default, 4). The warm
    # count is accuracy-certified per TRAJECTORY CLASS, not globally: 4
    # holds sub-mm on the slow flagship but leaves multi-cm close-band
    # errors on fast-motion randomized scenes (reports/
    # gjk_warm_accuracy.json, r5) — those envs pin a higher count here.
    hull_warm_iters: int | None = None
    # opt-in reduced precision for the FUSED batched path: 'bf16' casts the
    # per-policy row blocks (J/W/v and the identity Gram seed) to bfloat16
    # at the producer/kernel boundary — both the HBM write and the Pallas
    # kernel's read stream halve; all arithmetic and the LU resolve stay
    # f32 (ops/pallas_resolve.py). ~1% qdd error; None (default) keeps the
    # trajectory-parity f32 path.
    fused_blocks_dtype: str | None = None

    def gather_params(self) -> tuple:
        return tuple(p.params for p in self.policies)


def take_row(table, idx: Array) -> Array:
    """table[idx] for a small static table via a where-chain.

    A single-row dynamic gather from a tiny table measured 3.7% of flagship
    device time at 4096 envs (poorly tiled gather); K-1 selects fuse into
    one VPU kernel. Same where-chain-beats-gather result as the
    closest-primitive reduction (sim/collision.py).

    NOTE on out-of-range idx: falls through to row 0 (every comparison
    misses), UNLIKE table[idx] which clamps to the nearest edge row —
    callers must pre-clamp (the on_solved goal sequencers do, via
    jnp.minimum)."""
    table = jnp.asarray(table)
    out = jnp.broadcast_to(table[0], table.shape[1:])
    for k in range(1, table.shape[0]):
        out = jnp.where(idx == k, table[k], out)
    return out


def bind_goal(policy_names: tuple[str, ...]):
    """bind_params helper: set params['goal'] = sim.goal for named policies."""
    def bind(params, sim, policies):
        out = []
        for p, prm in zip(policies, params):
            if p.name in policy_names and sim.goal is not None:
                prm = dict(prm)
                prm["goal"] = sim.goal
            out.append(prm)
        return tuple(out)
    return bind


def _call_bind(bind, params, sim, policies, state):
    """Dispatch bind_params by arity: the classic 3-arg form
    (params, sim, policies) or the state-aware 4-arg form
    (params, sim, policies, env_state) — escape maneuvers and yielding
    bind DETOUR goals from EnvState.scratch without touching sim.goal
    (which the solved predicate reads). Arity is resolved once per
    function object at trace time (Python-side, free in the jit).

    The memo is a WeakKeyDictionary keyed by the function OBJECT — never
    id(): CPython reuses ids after GC, so an id-keyed cache handed a
    4-arg state-aware bind a stale arity of 3 whenever a long-lived
    process constructed several envs (round-4 regression, caught by
    test_obstacle_capacity_bucketing_no_retrace in suite order).
    Closures/lambdas are weakref-able; anything that isn't (rare) just
    pays inspect.signature each call — trace-time only, free."""
    import inspect
    try:
        arity = _BIND_ARITY.get(bind)
    except TypeError:
        arity = None
    if arity is None:
        try:
            arity = len(inspect.signature(bind).parameters)
        except (TypeError, ValueError):
            arity = 3
        try:
            _BIND_ARITY[bind] = arity
        except TypeError:
            pass
    if arity >= 4:
        return bind(params, sim, policies, state)
    return bind(params, sim, policies)


_BIND_ARITY: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def ee_position(env: Env, sim: SimState) -> Array:
    return K.fk_frame(env.model, sim.q, env.ee_frame)[:3, 3]


def is_solved(env: Env, sim: SimState) -> Array:
    if env.is_solved_fn is not None:
        return env.is_solved_fn(env, sim)
    x = ee_position(env, sim)
    goal = sim.goal
    if env.solved_xy_only:
        x, goal = x[:2], goal[:2]
    ok = jnp.linalg.norm(x - goal) < env.solved_tol
    if env.check_velocity is not None:
        ok = ok & (jnp.linalg.norm(sim.qd) < env.check_velocity)
    return ok


def _policy_inputs(env: Env, state: EnvState, params: tuple,
                   frame_ctx: dict | None = None):
    """(q, q̇, bound params, per-policy ctxs, fk bundle) for one tick.

    With analytic derivatives the closed-form FK sweep (core.fk_bundle) is
    computed HERE and its world transforms feed the distance context, so the
    tick runs exactly one FK — the second fk_all inside sense() measured ~8%
    of flagship device time before being deduplicated.

    frame_ctx: optional PRECOMPUTED distance context (the batched hull path
    computes it for the whole env batch with one fused Pallas GJK kernel
    before the per-env vmap)."""
    sim = state.sim
    policies = env.policies
    if env.bind_params is not None:
        params = _call_bind(env.bind_params, params, sim, policies, state)
    fk = None
    T_all = None
    if env.derivatives == "analytic":
        from rmp_tpu.core import fk_bundle
        fk = fk_bundle(policies, sim.q, sim.qd)
        fkd = fk.get(id(env.model))
        if fkd is not None:
            # per-frame T16 rows; the world-transform stack for the
            # distance context is (F, 16) = ~800 B/env (cheap)
            T_all = jnp.stack(fkd.T16).reshape(-1, 4, 4)
    if frame_ctx is not None:
        q, qd = sim.q, sim.qd
    elif env.context_fn is not None:
        q, qd = sim.q, sim.qd
        frame_ctx = env.context_fn(env.model, sim, T_all)
    else:
        q, qd, frame_ctx = sense(env.model, sim, T_all,
                                 env.collision_geometry)
    ctxs = tuple(frame_ctx.get(p.ctx_key) if getattr(p, "ctx_key", None)
                 else None for p in policies)
    return q, qd, params, ctxs, fk


def _advance(env: Env, state: EnvState, qdd):
    """Physics substeps + solved bookkeeping for one tick (per env)."""
    model = env.model
    sim = state.sim
    if env.update_scene is not None:
        sim = env.update_scene(sim)
    if env.max_qdd is not None:
        qdd = jnp.clip(jnp.nan_to_num(qdd, nan=0.0, posinf=0.0, neginf=0.0),
                       -env.max_qdd, env.max_qdd)
    if env.unroll_substeps and not env.contact:
        for _ in range(env.control_every):
            sim = physics_step(
                model, sim, qdd, env.dt, torque_mode=env.torque_mode,
                enforce_velocity_limits=env.enforce_velocity_limits)
    else:
        def substep(s, _):
            return physics_step(
                model, s, qdd, env.dt, torque_mode=env.torque_mode,
                enforce_velocity_limits=env.enforce_velocity_limits,
                contact=env.contact), None
        # unroll=True: XLA sees straight-line substeps (same runtime code as
        # the Python loop above) but the body is TRACED once — Python-side
        # trace/lower of the flagship rollout drops ~100s -> ~18s
        sim, _ = jax.lax.scan(substep, sim, None, length=env.control_every,
                              unroll=True)

    state = dataclasses.replace(state, sim=sim, steps=state.steps + 1)
    solved = is_solved(env, sim) if sim.goal is not None else jnp.asarray(False)
    event = solved
    if env.stuck_fn is not None:
        if env.on_solved is None:
            raise ValueError(
                "Env.stuck_fn requires on_solved: the stuck signal fires "
                "the resampling hook and is silently dead without one")
        if sim.goal is not None:
            # progress bookkeeping (see EnvState.goal_best): the FK here
            # CSEs with is_solved/aux — one sweep per tick either way
            d = (env.goal_distance_fn(env, sim)
                 if env.goal_distance_fn is not None
                 else jnp.linalg.norm(ee_position(env, sim) - sim.goal))
            improved = d < state.goal_best - env.progress_eps
            state = dataclasses.replace(
                state, goal_best=jnp.minimum(state.goal_best, d),
                no_progress=jnp.where(improved, 0, state.no_progress + 1))
        event = solved | env.stuck_fn(state)
    if env.on_solved is not None:
        resampled = env.on_solved(dataclasses.replace(
            state, solved_count=state.solved_count
            + solved.astype(jnp.int32)))
        # identity shortcut: leaves on_solved didn't touch (obstacle sets,
        # unchanged sim fields) skip the per-tick select entirely — the
        # blanket where over the full EnvState measured ~2% device time
        state = jax.tree.map(
            lambda a, b: b if a is b else jnp.where(event, a, b),
            resampled, state)
        if env.stuck_fn is not None:
            # fresh goal -> fresh progress window
            state = dataclasses.replace(
                state,
                goal_best=jnp.where(event, jnp.inf, state.goal_best),
                no_progress=jnp.where(event, 0, state.no_progress))
    else:
        # no resampling: solved_count saturates at 1 (the goal was reached)
        # instead of silently staying 0 forever
        state = dataclasses.replace(
            state, solved_count=jnp.maximum(
                state.solved_count, solved.astype(jnp.int32)))
    aux = dict(solved=solved, qdd=qdd,
               ee=ee_position(env, sim) if sim.goal is not None else None)
    if env.aux_fn is not None:
        aux.update(env.aux_fn(model, sim))
    if env.on_solved is not None:
        # resample-event flag: True when on_solved fired this tick (solve
        # OR stuck-timeout). Lets consumers reconstruct per-goal outcomes —
        # in particular whether the FIRST goal was solved before any
        # resample (evaluate.py's feasibility-conditioned success).
        aux["resample"] = event
    return state, aux


def make_control_step(env: Env):
    """Pure fn(env_state, params) -> (env_state, aux) for ONE control tick."""
    policies = env.policies

    def step(state: EnvState, params: tuple):
        if env.pre_tick is not None:
            state = env.pre_tick(state)
        q, qd, params_b, ctxs, fk = _policy_inputs(env, state, params)
        qdd = evaluate_policies(policies, q, qd, params_b, ctxs,
                                method=env.resolve_method,
                                derivatives=env.derivatives, fk=fk)
        return _advance(env, state, qdd)
    return step


def make_batched_control_step(env: Env):
    """Batched tick with the FUSED batched pullback+resolve: the per-env
    derivative/policy computation is vmapped into row-stacked (J, W, v) and
    the whole batch resolves at once, honoring env.resolve_method:

      * 'solve'  -> one Pallas pullback+pivoted-LU kernel (ridge-free, so the
                    fused and per-env 'solve' paths agree bit-for-algorithm);
                    batch must be a multiple of 128 (lane width);
      * other    -> batched XLA contraction A = J^T W, f = J^T v followed by
                    core.resolve(A, f, method) (pinv/cholesky stay honored
                    instead of being silently swapped for LU+ridge).
    """
    from rmp_tpu.core import policy_row_blocks_structured, resolve
    from rmp_tpu.ops.pallas_resolve import pullback_resolve_structured

    if env.fused_blocks_dtype not in (None, "bf16"):
        raise ValueError(
            f"fused_blocks_dtype must be None or 'bf16', "
            f"got {env.fused_blocks_dtype!r}")
    policies = env.policies
    tag_box: list = []

    def rows(state: EnvState, params: tuple, frame_ctx):
        q, qd, params_b, ctxs, fk = _policy_inputs(env, state, params,
                                                   frame_ctx=frame_ctx)
        tags, blocks = policy_row_blocks_structured(
            policies, q, qd, params_b, ctxs,
            derivatives=env.derivatives, fk=fk)
        # tags are trace-static (policy/taskmap structure only); capture
        # them through the vmap trace for the consumer below
        tag_box.clear()
        tag_box.extend(tags)
        return blocks

    def batched_hull_ctx(states: EnvState):
        """Whole-batch distance context via the fused Pallas GJK kernel
        (one kernel for all B x L x K pairs — the XLA per-env scan lowering
        was latency-bound at ~5% of HBM peak). The extra fk_all here CSEs
        with the FkDerivatives recursion inside rows (same subexpressions
        on the same q). Returns (ctx, warm_next): states.gjk_warm (seeded
        by make_batched_rollout / make_batched_reset) feeds the temporal
        GJK warm start and warm_next is carried into the next tick."""
        from rmp_tpu.sim.data import distance_context_batched
        T_all_b = jax.vmap(lambda q: K.fk_all(env.model, q))(states.sim.q)
        return distance_context_batched(env.model, T_all_b,
                                        states.sim.obstacles, "hull",
                                        warm=states.gjk_warm,
                                        iters=env.hull_warm_iters)

    def step(states: EnvState, params: tuple):
        # batch-major structured per-policy blocks; the kernel accumulates
        # across blocks so rows are never concatenated (7.6% of device
        # time), identity-J policies seed the Gram accumulators directly
        # (their (B, n, n) eye blocks and eye-matmuls were pure waste), and
        # 1-D task-space blocks form W = m * J in VMEM instead of HBM.
        # One fused transpose per block into batch-on-lanes layout
        # (batch-minor vmap out_axes producers measured 7% slower).
        if env.pre_tick is not None:
            # before the batched hull ctx: pre_tick never touches q
            # (contract in the Env field docstring), so the precomputed
            # distance context stays consistent either way — but scratch/
            # goal updates must be visible to bind_params inside rows
            states = jax.vmap(env.pre_tick)(states)
        frame_ctx = None
        warm_next = None
        if (env.collision_geometry == "hull" and env.context_fn is None
                and states.sim.obstacles is not None
                and states.sim.q.shape[0] % 128 == 0):
            frame_ctx, warm_next = batched_hull_ctx(states)
        blocks = jax.vmap(rows, in_axes=(0, None, 0))(states, params,
                                                      frame_ctx)
        tags = tuple(tag_box)
        if env.resolve_method == "solve":
            block_dtype = (jnp.bfloat16
                           if env.fused_blocks_dtype == "bf16" else None)
            qdd = pullback_resolve_structured(tags, blocks, ridge=0.0,
                                              block_dtype=block_dtype)
        else:
            n = env.model.n_q
            A = jnp.zeros((states.sim.q.shape[0], n, n), jnp.float32)
            f = jnp.zeros((states.sim.q.shape[0], n), jnp.float32)
            for tag, blk in zip(tags, blocks):
                if tag == "identity":
                    M, v = blk
                    A = A + M
                    f = f + v
                elif tag == "scalar":
                    J, m, v = blk
                    A = A + jnp.einsum("brn,br,brm->bnm", J, m, J)
                    f = f + jnp.einsum("brn,br->bn", J, v)
                else:
                    J, W, v = blk
                    A = A + jnp.einsum("brn,brm->bnm", J, W)
                    f = f + jnp.einsum("brn,br->bn", J, v)
            qdd = resolve(A, f, env.resolve_method)
        out, aux = jax.vmap(lambda s, a: _advance(env, s, a))(states, qdd)
        if warm_next is not None:
            # The warm carry is kept through resamples: every on_solved in
            # the registry moves only the GOAL (franka.py:360-366 etc.), so
            # the collision geometry — and with it the converged witness
            # direction — is unchanged. (An env whose on_solved ever moves
            # obstacles or teleports q should zero state.gjk_warm itself;
            # zeroing falls back to the capsule-witness start, which is
            # recomputed from the current scene every tick.)
            out = dataclasses.replace(out, gjk_warm=warm_next)
        return out, aux
    return step


def make_rollout(env: Env, n_ticks: int, remat: bool = False):
    """fn(env_state, params) -> (final_state, stacked aux) via lax.scan.

    remat=True wraps the tick in jax.checkpoint: reverse-mode gradients
    through the rollout (gain tuning, trajectory optimization) store only
    the per-tick carry and recompute tick internals on the backward pass —
    activation memory drops from O(ticks x tick-graph) to O(ticks x state),
    trading one extra forward evaluation per tick."""
    raw_step = make_control_step(env)
    step = jax.checkpoint(raw_step) if remat else raw_step

    def rollout(state: EnvState, params: tuple):
        # probe with the UN-checkpointed step: jax.checkpoint emits one
        # opaque remat equation that never forwards vars, which would make
        # the invariance probe see every leaf as varying (hoisting lost)
        return _scan_with_invariant_carry(
            lambda s: step(s, params), state, n_ticks, True,
            probe_fn=lambda s: raw_step(s, params))
    return rollout


def _wants_gjk_warm(env: Env, states: EnvState) -> bool:
    """True when the batched hull path (Pallas kernel + temporal warm
    start) will run for these states and gjk_warm should be seeded."""
    return (env.collision_geometry == "hull" and env.context_fn is None
            and states.gjk_warm is None
            and states.sim.obstacles is not None
            and states.sim.q.ndim == 2
            and states.sim.q.shape[0] % 128 == 0)


def _seed_gjk_warm(env: Env, states: EnvState) -> EnvState:
    """CONVERGED (B, L, K, 3) witness-direction warm carry from one cold
    10-iteration hull query on the initial states. Seeding with zeros (=
    capsule-witness fallback) made tick 0 run the warm iteration count
    (RMP_GJK_ITERS, 4) from a start the accuracy band was never measured
    at — the band assumes either 10 cold iterations or a previous-tick
    converged witness. One extra query per rollout is noise next to the
    per-tick loop."""
    from rmp_tpu.sim.data import distance_context_batched
    T_all_b = jax.vmap(lambda q: K.fk_all(env.model, q))(states.sim.q)
    _, warm = distance_context_batched(env.model, T_all_b,
                                       states.sim.obstacles,
                                       geometry="hull", iters=10)
    return dataclasses.replace(states, gjk_warm=warm)


def make_batched_reset(env: Env, batch: int):
    def reset(key: Array):
        states = jax.vmap(env.reset)(jax.random.split(key, batch))
        if _wants_gjk_warm(env, states):
            states = _seed_gjk_warm(env, states)
        return states
    return reset


def _scan_with_invariant_carry(step_fn, state, n_ticks, with_aux,
                               probe_fn=None, unroll: int = 1):
    """lax.scan over ticks with loop-INVARIANT state leaves hoisted out of
    the carry. Leaves the step passes through untouched (static obstacle
    sets, fixed scene data — jax forwards the identical tracer, detected
    here at trace time via `is`) become scan closure constants instead of
    loop-carried values; the per-tick carry copies of a constant 4096-env
    obstacle set measured ~4% of flagship device time. Envs that DO mutate
    a leaf (moving obstacles, resampled scenes) return fresh tracers for
    it, so it stays in the carry automatically."""
    flat, treedef = jax.tree.flatten(state)
    # invariance probe via make_jaxpr (trace only, never executed — a plain
    # probe call would run a full discarded tick on device in eager/grad
    # contexts): a leaf the step forwards untouched appears as the SAME Var
    # in the jaxpr's outvars as in its invars. probe_fn: un-decorated step
    # for when step_fn is wrapped (jax.checkpoint emits a single opaque
    # remat equation that never forwards vars, which would defeat the probe)
    closed = jax.make_jaxpr(lambda leaves: jax.tree.leaves(
        (probe_fn or step_fn)(jax.tree.unflatten(treedef, leaves))[0]))(flat)
    invars, outvars = closed.jaxpr.invars, closed.jaxpr.outvars
    var_idx = [k for k in range(len(flat)) if outvars[k] is not invars[k]]

    def body(var_leaves, _):
        leaves = list(flat)
        for k, leaf in zip(var_idx, var_leaves):
            leaves[k] = leaf
        s, aux = step_fn(jax.tree.unflatten(treedef, leaves))
        out = jax.tree.leaves(s)
        return [out[k] for k in var_idx], aux if with_aux else None

    final_var, aux = jax.lax.scan(body, [flat[k] for k in var_idx], None,
                                  length=n_ticks, unroll=unroll)
    leaves = list(flat)
    for k, leaf in zip(var_idx, final_var):
        leaves[k] = leaf
    return jax.tree.unflatten(treedef, leaves), aux


def make_batched_rollout(env: Env, n_ticks: int, fused_resolve: bool = False,
                         with_aux: bool = True, remat: bool = False,
                         tick_unroll: int = 1):
    """Batched rollout: params shared across the batch, state batched.

    fused_resolve=True resolves the whole batch at once per tick
    (make_batched_control_step); with resolve_method='solve' that is the
    Pallas LU kernel and batch must be a multiple of 128.

    with_aux=False returns (final_state, None) and skips the per-tick aux
    stacking + the (T, B)->(B, T) layout transpose entirely — the transpose
    alone was 6.2% of flagship device time (trace_report --by-source), pure
    overhead for throughput consumers that only read the final state.

    tick_unroll: lax.scan unroll factor over TICKS (fused path) — gives XLA
    a k-tick basic block to fuse across tick boundaries (per-op-overhead
    experiments; client trace cost is unchanged, HLO grows ~k-fold)."""
    if fused_resolve:
        raw_step = make_batched_control_step(env)
        step = jax.checkpoint(raw_step) if remat else raw_step

        def rollout(states: EnvState, params: tuple):
            if _wants_gjk_warm(env, states):
                # states built outside make_batched_reset: seed here so the
                # scan carry structure is fixed (None -> array mid-scan
                # would be a carry-structure mismatch)
                states = _seed_gjk_warm(env, states)
            final, aux = _scan_with_invariant_carry(
                lambda s: step(s, params), states, n_ticks, with_aux,
                probe_fn=lambda s: raw_step(s, params),
                unroll=tick_unroll)
            if not with_aux:
                return final, None
            # match the vmapped path's aux layout: leading env axis (B, T, ...)
            aux = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), aux)
            return final, aux
        return rollout
    rollout = make_rollout(env, n_ticks, remat=remat)
    batched = jax.vmap(rollout, in_axes=(0, None))
    if not with_aux:
        return lambda states, params: (batched(states, params)[0], None)
    return batched
