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
      'solve'    — LU solve (fast TPU path; identical to pinv whenever the
                   combined metric is invertible, which every shipped policy
                   stack guarantees via its damping/inertia terms).
      'cholesky' — ridge-regularized PSD solve (fastest; valid when all leaf
                   metrics are PSD — true for every shipped policy except the
                   v1 JointLimitAvoidance asymmetric-metric quirk).
    """
    if method == "pinv":
        return geom.mv(jnp.linalg.pinv(A), f)
    if method == "solve":
        return jnp.linalg.solve(A, f)
    if method == "cholesky":
        n = A.shape[-1]
        A_sym = 0.5 * (A + jnp.swapaxes(A, -1, -2)) + 1e-6 * jnp.eye(n, dtype=A.dtype)
        return jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(A_sym), f)
    raise ValueError(f"unknown resolve method: {method}")


def evaluate_policies(policies: Sequence[Policy], q: Array, qd: Array,
                      params: Sequence[Any], ctxs: Sequence[Any],
                      method: str = "pinv") -> Array:
    """Pure-functional combined RMP evaluation: q̈_desired (n_q,).

    params/ctxs are per-policy pytrees aligned with `policies` (structure is
    trace-static; values are traced).
    """
    q = jnp.asarray(q, jnp.float32)
    qd = jnp.asarray(qd, jnp.float32)

    def stacked_taskmaps(qq):
        return tuple(p.taskmap(qq, ctx) for p, ctx in zip(policies, ctxs))

    # one forward pass + one jvp for (x, xd); one jacfwd for all J's;
    # one nested jvp for all curvature terms.
    x_all, xd_all = jax.jvp(stacked_taskmaps, (q,), (qd,))
    J_all = jax.jacfwd(stacked_taskmaps)(q)
    _, c_all = jax.jvp(lambda qq: jax.jvp(stacked_taskmaps, (qq,), (qd,))[1],
                       (q,), (qd,))

    n = q.shape[-1]
    f_comb = jnp.zeros((n,), jnp.float32)
    A_comb = jnp.zeros((n, n), jnp.float32)
    for p, prm, ctx, x, xd, J, c in zip(policies, params, ctxs, x_all, xd_all,
                                        J_all, c_all):
        a, M = p.accel_metric(prm, x, xd, ctx)
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

    def __init__(self, rmps: dict | None = None, method: str = "pinv"):
        self.rmps: dict[str, Policy] = dict(rmps) if rmps else {}
        self.method = method
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

        def fn(q, qd, params, ctxs):
            return evaluate_policies(policies, q, qd, params, ctxs, method)
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
