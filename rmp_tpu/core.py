"""RMP combination engine: pullback, accumulate, resolve.

Capability parity with reference RmpCore (rmp.py:111-180):

    f = sum_i J_i^T M_i (a_i - c_i)        (pullback of each leaf RMP)
    A = sum_i J_i^T M_i J_i
    q̈ = pinv(A) f

TPU-first design differences from the reference:
  * ONE stacked jacfwd: all policies' taskmaps are differentiated together in
    a single forward-mode pass (n_q JVPs of the whole FK+taskmap tree, with
    XLA CSE sharing the kinematic chain across policies) instead of one
    double-GradientTape + per-output backward pass per policy per tick
    (reference rmp.py:157-159, kinematics.py:253-270).
  * Everything is a pure function of (q, q̇, params, ctx): gains/goals and
    per-tick obstacle data are traced inputs — no tf.Variable mutation, no
    retracing, and the whole evaluation jits, vmaps over environment batches,
    and shards over device meshes.
  * The pullback contraction is expressed as two batched matmuls over the
    row-stacked task coordinates so XLA can fuse them; an optional Pallas
    kernel covers the batched small-matrix path (ops/pallas_resolve.py).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp

from rmp_tpu.ops import geom
from rmp_tpu.policies.base import Policy

Array = jax.Array


def _pullback(J, M, a, c):
    """f = J^T M (a - c), A = J^T M J, summed over the pair axis.

    J: (P, d, n); M: (P, d, d); a, c: (P, d)  ->  f (n,), A (n, n).
    """
    W = geom.mm(M, J)                                   # (P, d, n)
    JT = jnp.swapaxes(J, -1, -2)                        # (P, n, d)
    A = jnp.sum(geom.mm(JT, W), axis=0)                 # (n, n)
    f = jnp.sum(geom.mv(JT, geom.mv(M, a - c)), axis=0)
    return f, A


def resolve(A: Array, f: Array, method: str = "pinv") -> Array:
    """q̈ = A^+ f.

    method:
      'pinv'     — Moore-Penrose via SVD (reference parity, rmp.py:153-155).
      'solve'    — trace-time-unrolled pivoted LU (fast TPU path; identical
                   to pinv whenever the combined metric is invertible, and
                   valid for INDEFINITE metrics — which the stacks can
                   produce near the JointVelocityCap singular band).
      'cholesky' — ridge-regularized PSD solve, trace-time unrolled (fastest;
                   ONLY valid while the combined metric stays numerically PD
                   — violated near the velocity-cap band and by the v1
                   JointLimitAvoidance asymmetric-metric quirk; prefer
                   'solve' for long/randomized rollouts).
    """
    if method == "pinv":
        return geom.mv(jnp.linalg.pinv(A), f)
    if method == "solve":
        from rmp_tpu.ops.linalg import lu_solve_unrolled
        return lu_solve_unrolled(A, f)
    if method == "cholesky":
        from rmp_tpu.ops.linalg import cholesky_solve_unrolled
        return cholesky_solve_unrolled(A, f)
    raise ValueError(f"unknown resolve method: {method}")


def _taskmap_derivatives_jacfwd(policies, q, qd, ctxs):
    """Generic path: one stacked jacfwd over every policy's taskmap, with
    fk_all shared across FK-rooted taskmaps (13 joint transforms + n_q
    tangent sweeps total — vs one FK autodiff graph per policy per tick in
    the reference, rmp.py:142-159)."""
    fk_models: dict[int, Any] = {}
    for p in policies:
        tmap = p.taskmap
        if getattr(tmap, "fk_rooted", False):
            fk_models.setdefault(id(tmap.model), tmap.model)

    def stacked_taskmaps(qq):
        from rmp_tpu.models.kinematics import fk_all
        T16 = {mid: fk_all(m, qq).reshape(-1, 16)
               for mid, m in fk_models.items()}
        outs = []
        for p, ctx in zip(policies, ctxs):
            tmap = p.taskmap
            if getattr(tmap, "fk_rooted", False):
                i = tmap.frame_idx
                T = (T16[id(tmap.model)][jnp.asarray(i)] if isinstance(i, tuple)
                     else T16[id(tmap.model)][i][None, :])
                outs.append(tmap.post(T, ctx))
            else:
                outs.append(tmap(qq, ctx))
        return tuple(outs)

    x_all, xd_all = jax.jvp(stacked_taskmaps, (q,), (qd,))
    J_all = jax.jacfwd(stacked_taskmaps)(q)
    _, c_all = jax.jvp(lambda qq: jax.jvp(stacked_taskmaps, (qq,), (qd,))[1],
                       (q,), (qd,))
    return x_all, xd_all, J_all, c_all


def _post_chain(post, T_blk, Td_blk, Jcols, c_blk, ctx):
    """Chain (x, ẋ, J, c) of frame derivatives through a post map h(T16s):

        x  = h(T)            ẋ = Dh[Ṫ]
        J  = Dh ∘ J_T        c = Dh[T̈] + D²h[Ṫ, Ṫ]

    T_blk/Td_blk/c_blk: (L, 16); Jcols: (L, 16, n) — L frame rows feeding the
    post (L = 1 for single-frame taskmaps). Dh applications are jvp's of the
    tiny post map only (the FK chain is already differentiated
    analytically)."""
    h = lambda t: post(t, ctx)
    x, xd = jax.jvp(h, (T_blk,), (Td_blk,))
    J = jax.vmap(lambda v: jax.jvp(h, (T_blk,), (v,))[1],
                 in_axes=2, out_axes=-1)(Jcols)
    g = lambda t: jax.jvp(h, (t,), (Td_blk,))[1]
    _, quad = jax.jvp(g, (T_blk,), (Td_blk,))
    c = jax.jvp(h, (T_blk,), (c_blk,))[1] + quad
    return x, xd, J, c


def fk_bundle(policies, q, qd):
    """{id(model): FkDerivatives(model, q, qd)} for every distinct FK model
    under `policies` — the shared closed-form FK recursion with LAZY
    per-frame row emission (full 16-row or translation-only 3-row blocks,
    models/fk_derivatives.FkDerivatives) so consumers stack exactly the
    rows they use. Callers that also need plain world transforms at the
    same q (distance contexts, solved checks) should stack bundle[mid].T16
    instead of a second fk_all: the duplicate FK measured ~8% of flagship
    device time."""
    from rmp_tpu.models.fk_derivatives import FkDerivatives

    fk_models: dict[int, Any] = {}
    for p in policies:
        tmap = p.taskmap
        if getattr(tmap, "fk_rooted", False):
            fk_models.setdefault(id(tmap.model), tmap.model)
    return {mid: FkDerivatives(m, q, qd) for mid, m in fk_models.items()}


def _taskmap_derivatives_analytic(policies, q, qd, ctxs, fk=None):
    """Fast path: closed-form FK derivatives (models/fk_derivatives.py, twist
    generators) + exact identity-map shortcuts; only each policy's small post
    map sees autodiff. Falls back to per-policy jacfwd for generic taskmaps.

    fk: optional precomputed fk_bundle(policies, q, qd)."""
    from rmp_tpu.models.kinematics import differentiate

    if fk is None:
        fk = fk_bundle(policies, q, qd)

    n = q.shape[-1]
    eye = jnp.eye(n, dtype=q.dtype)[None]
    zeros = jnp.zeros((1, n), q.dtype)
    x_all, xd_all, J_all, c_all = [], [], [], []
    for p, ctx in zip(policies, ctxs):
        tmap = p.taskmap
        if getattr(tmap, "fk_rooted", False):
            fkd = fk[id(tmap.model)]                     # FkDerivatives
            i = tmap.frame_idx
            sel = list(i) if isinstance(i, tuple) else [i]
            # stack ONLY the rows this policy's post consumes — no
            # all-frames (B, F, 16, n) intermediate, no device gather.
            # Translation-only posts (position/distance chains) take the
            # direct 3-row products (a quarter of the full-row FLOPs; the
            # (B, L, 16, n) Jacobian stacks were the single largest
            # flagship intermediate — these are (B, L, 3, n)).
            if tmap.post_trans is not None:
                rows = [fkd.trans_row(k) for k in sel]
                post = tmap.post_trans
            else:
                rows = [fkd.full_row(k) for k in sel]
                post = tmap.post
            blk = tuple(jnp.stack(z) for z in zip(*rows))
            x, xd, J, c = _post_chain(post, *blk, ctx)
        elif getattr(tmap, "is_identity", False):
            x, xd, J, c = q[None, :], qd[None, :], eye, zeros
        else:
            x, xd, J, c = differentiate(lambda qq: tmap(qq, ctx), q, qd)
        x_all.append(x); xd_all.append(xd); J_all.append(J); c_all.append(c)
    return tuple(x_all), tuple(xd_all), tuple(J_all), tuple(c_all)


def policy_row_blocks(policies: Sequence[Policy], q: Array, qd: Array,
                      params: Sequence[Any], ctxs: Sequence[Any],
                      derivatives: str = "analytic", fk=None):
    """Per-policy pullback row blocks for one env:
    ([J_b (R_b, n)], [W_b (R_b, n)], [v_b (R_b,)]) with R_b = P_b * d_b
    (static), W = M J and v = M (a - c) rows.

    The combined system is A = Σ_b J_b^T W_b, f = Σ_b J_b^T v_b — consumed
    by the multi-block Pallas kernel (pullback_resolve_blocks), which
    accumulates across blocks in-kernel so the rows are never concatenated
    (the concatenates measured 7.6% of the flagship tick's device time)."""
    q = jnp.asarray(q, jnp.float32)
    qd = jnp.asarray(qd, jnp.float32)
    if derivatives == "jacfwd":
        x_all, xd_all, J_all, c_all = _taskmap_derivatives_jacfwd(
            policies, q, qd, ctxs)
    else:
        x_all, xd_all, J_all, c_all = _taskmap_derivatives_analytic(
            policies, q, qd, ctxs, fk=fk)
    n = q.shape[-1]
    Js, Ws, vs = [], [], []
    for p, prm, ctx, x, xd, J, c in zip(policies, params, ctxs, x_all, xd_all,
                                        J_all, c_all):
        a, M = p.accel_metric(prm, x, xd, ctx)
        Js.append(J.reshape(-1, n))
        Ws.append(geom.mm(M, J).reshape(-1, n))
        vs.append(geom.mv(M, a - c).reshape(-1))
    return Js, Ws, vs


def policy_row_blocks_structured(policies: Sequence[Policy], q: Array,
                                 qd: Array, params: Sequence[Any],
                                 ctxs: Sequence[Any],
                                 derivatives: str = "analytic", fk=None):
    """Structure-exposing variant of policy_row_blocks: (tags, blocks) where
    tags[i] in {'identity', 'scalar', 'dense'} and blocks[i] is

      'identity': (M (n, n), v (n,))        — J == I_n, so J^T M J = M and
                                              J^T M (a-c) = v; no J/W rows
                                              exist at all (the eye-matmul
                                              and its (B, n, n) J block were
                                              pure waste)
      'scalar':   (J (R, n), m (R,), v (R,)) — 1-D task spaces (distance
                                              policies): M = diag-free scalar
                                              per row, so W = m * J is formed
                                              IN the consumer (the Pallas
                                              kernel) instead of being
                                              materialized to HBM
      'dense':    (J (R, n), W (R, n), v (R,)) — general case

    Consumed by ops/pallas_resolve.pullback_resolve_structured and the
    einsum fallback in envs/base.make_batched_control_step. tags are
    trace-static (they depend only on the policy/taskmap structure)."""
    q = jnp.asarray(q, jnp.float32)
    qd = jnp.asarray(qd, jnp.float32)
    if derivatives == "jacfwd":
        x_all, xd_all, J_all, c_all = _taskmap_derivatives_jacfwd(
            policies, q, qd, ctxs)
    else:
        x_all, xd_all, J_all, c_all = _taskmap_derivatives_analytic(
            policies, q, qd, ctxs, fk=fk)
    n = q.shape[-1]
    tags, blocks = [], []
    for p, prm, ctx, x, xd, J, c in zip(policies, params, ctxs, x_all, xd_all,
                                        J_all, c_all):
        a, M = p.accel_metric(prm, x, xd, ctx)
        if getattr(p.taskmap, "is_identity", False):
            tags.append("identity")
            blocks.append((M.reshape(n, n), geom.mv(M, a - c).reshape(-1)))
        elif x.shape[-1] == 1:
            tags.append("scalar")
            m = M.reshape(-1)                        # (P,) scalar metrics
            blocks.append((J.reshape(-1, n), m,
                           m * (a - c).reshape(-1)))
        else:
            tags.append("dense")
            blocks.append((J.reshape(-1, n), geom.mm(M, J).reshape(-1, n),
                           geom.mv(M, a - c).reshape(-1)))
    return tuple(tags), tuple(blocks)


def policy_rows(policies: Sequence[Policy], q: Array, qd: Array,
                params: Sequence[Any], ctxs: Sequence[Any],
                derivatives: str = "analytic"):
    """Row-stacked pullback inputs for one env: (J (R, n), W (R, n), v (R,))
    with R = sum_i P_i * d_i (static) — the concatenated form of
    policy_row_blocks for consumers wanting one system (tests, the
    single-input Pallas kernel)."""
    Js, Ws, vs = policy_row_blocks(policies, q, qd, params, ctxs, derivatives)
    return (jnp.concatenate(Js), jnp.concatenate(Ws), jnp.concatenate(vs))


def evaluate_policies(policies: Sequence[Policy], q: Array, qd: Array,
                      params: Sequence[Any], ctxs: Sequence[Any],
                      method: str = "pinv",
                      derivatives: str = "analytic", fk=None) -> Array:
    """Pure-functional combined RMP evaluation: q̈_desired (n_q,).

    params/ctxs are per-policy pytrees aligned with `policies` (structure is
    trace-static; values are traced). derivatives: 'analytic' (closed-form FK
    derivative propagation, default) or 'jacfwd' (generic autodiff) — both
    exact, cross-validated in tests.
    """
    q = jnp.asarray(q, jnp.float32)
    qd = jnp.asarray(qd, jnp.float32)

    if derivatives == "jacfwd":
        x_all, xd_all, J_all, c_all = _taskmap_derivatives_jacfwd(
            policies, q, qd, ctxs)
    else:
        x_all, xd_all, J_all, c_all = _taskmap_derivatives_analytic(
            policies, q, qd, ctxs, fk=fk)

    n = q.shape[-1]
    f_comb = jnp.zeros((n,), jnp.float32)
    A_comb = jnp.zeros((n, n), jnp.float32)
    for p, prm, ctx, x, xd, J, c in zip(policies, params, ctxs, x_all, xd_all,
                                        J_all, c_all):
        a, M = p.accel_metric(prm, x, xd, ctx)
        if getattr(p.taskmap, "is_identity", False):
            # J == I_n: J^T M J = M, J^T M (a-c) = M (a-c) exactly — skip
            # the eye matmuls (identical values, fewer VPU kernels)
            f_comb = f_comb + jnp.sum(geom.mv(M, a - c), axis=0)
            A_comb = A_comb + jnp.sum(M, axis=0)
            continue
        f, A = _pullback(J, M, a, c)
        f_comb = f_comb + f
        A_comb = A_comb + A
    return resolve(A_comb, f_comb, method)


class RmpCore:
    """Registry of named policies + jit-cached evaluation.

    Mirrors the reference RmpCore surface (add_rmp / remove_rmp_by_name /
    evaluate / __str__, rmp.py:111-155) while staying functional underneath:
    `evaluate` re-jits only when the policy *set* changes; params and per-tick
    context are traced arguments.
    """

    def __init__(self, rmps: dict | None = None, method: str = "pinv",
                 derivatives: str = "analytic"):
        self.rmps: dict[str, Policy] = dict(rmps) if rmps else {}
        self.method = method
        self.derivatives = derivatives
        self._compiled = None

    def __str__(self) -> str:
        if not self.rmps:
            return "no RMPs in use.\n"
        out = "\nused RMPs:\n"
        for i, rmp in enumerate(self.rmps.values()):
            out += "\t".join([str(i), rmp.name, str(type(rmp))]) + "\n"
        return out

    def add_rmp(self, rmp: Policy) -> None:
        self.rmps[rmp.name] = rmp
        self._compiled = None

    def remove_rmp_by_name(self, name: str) -> None:
        self.rmps.pop(name)
        self._compiled = None

    # -- functional interface -------------------------------------------------

    @property
    def policies(self) -> tuple[Policy, ...]:
        return tuple(self.rmps.values())

    def gather_params(self) -> tuple:
        return tuple(p.params for p in self.policies)

    def make_evaluate(self):
        """Return the pure fn(q, qd, params_tuple, ctx_tuple) -> q̈_des."""
        policies = self.policies
        method = self.method
        derivatives = self.derivatives

        def fn(q, qd, params, ctxs):
            return evaluate_policies(policies, q, qd, params, ctxs, method,
                                     derivatives)
        return fn

    # -- eager convenience (reference-style call) ------------------------------

    def evaluate(self, q, qd, context: dict | None = None, params=None):
        """q̈_des for a single (q, q̇) — reference rmp.py:133-155 surface.

        context: dict name -> ctx pytree for policies that need per-tick data.
        """
        if self._compiled is None:
            self._compiled = jax.jit(self.make_evaluate())
        if params is None:
            params = self.gather_params()
        ctxs = tuple((context or {}).get(p.name) for p in self.policies)
        return self._compiled(jnp.asarray(q, jnp.float32),
                              jnp.asarray(qd, jnp.float32), params, ctxs)
