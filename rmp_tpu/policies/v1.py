"""v1 policy set (Ratliff-2018-style RMPs).

Capability parity with reference rmp.py:226-382:
  target_policy               <-> TargetPolicy              (rmp.py:226-261)
  collision_avoidance         <-> CollisionAvoidance        (rmp.py:264-315)
  configuration_space_biasing <-> ConfigurationSpaceBiasing (rmp.py:318-347)
  joint_limit_avoidance       <-> JointLimitAvoidance       (rmp.py:349-382)

Formulas are replicated exactly, including two reference idiosyncrasies that
affect trajectories and therefore parity:
  * JointLimitAvoidance multiplies the per-joint weight vector into the
    stretched metric by broadcasting over the *last* axis only
    (A[i, j] = w[j] H[i, j], reference rmp.py:377) — an asymmetric metric.
  * TargetPolicy's soft-norm uses h = z + c*log(1+exp(-2 c z)) (rmp.py:244),
    i.e. a `c*` factor, while the shared helper uses `1/c` — both forms exist
    in the reference and are kept distinct here.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from rmp_tpu.ops.metrics import (cubic_spline_weight,
                                 directionally_stretched_metric)
from rmp_tpu.policies.base import Policy
from rmp_tpu.taskmaps import identity


def _target_motion(params, x, xd):
    v = params["goal"] - x                                   # (P, d)
    z = jnp.linalg.norm(v, axis=-1, keepdims=True)
    c = params["c"]
    h = z + c * jnp.log1p(jnp.exp(-2.0 * c * z))             # rmp.py:244
    s = v / h
    return params["alpha"] * s - params["beta"] * xd


def _target_accel_metric(params, x, xd, ctx):
    del ctx
    a = _target_motion(params, x, xd)
    z = jnp.linalg.norm(x - params["goal"], axis=-1)         # (P,)
    beta_dir = 1.0 - jnp.exp(-0.5 * z**2 / params["sigma_H"] ** 2)
    H = directionally_stretched_metric(a, beta=beta_dir, c=params["c"])
    w = jnp.exp(-z / params["sigma_w"])                      # rmp.py:257
    M = w[..., None, None] * H
    return a, M


def target_policy(goal, taskmap, alpha, beta, c, name="Target_RMP",
                  sigma_H=1.0, sigma_w=3.0) -> Policy:
    """Soft-norm attractor with directionally stretched metric."""
    params = dict(goal=jnp.asarray(goal, jnp.float32), alpha=alpha, beta=beta,
                  c=c, sigma_H=sigma_H, sigma_w=sigma_w)
    return Policy(name, taskmap, _target_accel_metric, params)


def _collision_motion(params, x, xd, ctx):
    d = ctx["distance"].reshape(-1)                          # (P,)
    vec = ctx["normal"].reshape(-1, 3)                       # (P, 3)
    alpha_rep = params["eta_rep"] * jnp.exp(-d / params["nu_rep"])
    f_rep = alpha_rep[:, None] * vec
    alpha_damp = params["eta_damp"] / (d / params["nu_damp"] + 1e-6)
    scaling = jnp.maximum(0.0, jnp.sum(-xd * vec, axis=-1))  # (P,)
    # P_obs @ xd with P_obs = scaling * vec vec^T, expanded as
    # scaling * (vec . xd) * vec: identical math (reference rmp.py damping
    # projection), but no (P, 3, 3) outer product and no tiny batched
    # dot_general (einsum here measured as a latency-bound MXU dispatch in
    # the dual-arm trace)
    f_damp = (alpha_damp * scaling * jnp.sum(vec * xd, axis=-1))[:, None] * vec
    return f_rep - f_damp


def _collision_accel_metric(params, x, xd, ctx):
    a = _collision_motion(params, x, xd, ctx)
    d = ctx["distance"].reshape(-1)
    w = cubic_spline_weight(d, params["r"])                  # (P,)
    if "mask" in ctx:
        w = w * ctx["mask"].reshape(-1)
    H = directionally_stretched_metric(a, beta=0.0, c=params["c"])
    M = w[:, None, None] * H
    return a, M


def collision_avoidance(taskmap, eta_rep, nu_rep, eta_damp, nu_damp, r, c,
                        name="collision_avoidance") -> Policy:
    """Exponential repulsion + directional damping in task space; the
    per-pair distance d and contact normal come from ctx (the reference read
    them from Datamanager tf.Variables, rmp.py:266-276)."""
    params = dict(eta_rep=eta_rep, nu_rep=nu_rep, eta_damp=eta_damp,
                  nu_damp=nu_damp, r=r, c=c)
    return Policy(name, taskmap, _collision_accel_metric, params)


def _cspace_bias_accel_metric(params, x, xd, ctx):
    del ctx
    a = params["gamma_p"] * (params["q0"] - x) - params["gamma_d"] * xd
    n = x.shape[-1]
    M = params["w"] * jnp.broadcast_to(jnp.eye(n, dtype=x.dtype),
                                       x.shape[:-1] + (n, n))
    return a, M


def configuration_space_biasing(q0, gamma_p, gamma_d, name, w=0.05) -> Policy:
    """PD pull toward a preferred configuration with constant metric w*I."""
    params = dict(q0=jnp.asarray(q0, jnp.float32), gamma_p=gamma_p,
                  gamma_d=gamma_d, w=w)
    return Policy(name, identity(), _cspace_bias_accel_metric, params)


_QD_MAX = 20.0 * (2.0 * np.pi) / 60.0                        # 20 rpm, rmp.py:374


def _joint_limit_accel_metric(params, q, qd, ctx):
    del ctx
    low, high = params["lower"], params["upper"]
    d_upper = (high - q) / (high - low)
    d_lower = (q - low) / (high - low)
    d = jnp.minimum(d_upper, d_lower)                        # (P, n)
    w = cubic_spline_weight(d, 0.15)                         # rmp.py:364-370
    v = qd / _QD_MAX
    H = directionally_stretched_metric(v, beta=0.9, c=5.0)
    # reference broadcast quirk (rmp.py:377): w (P,n) * H (P,n,n) multiplies
    # along the last axis -> asymmetric metric A[i,j] = w[j] H[i,j].
    M = w[..., None, :] * H
    a = -params["gamma_p"] * q - params["gamma_d"] * qd      # rmp.py:380-382
    return a, M


def joint_limit_avoidance(lower_limits, upper_limits, gamma_p, gamma_d,
                          name="joint_limit_avoidance") -> Policy:
    """Joint-limit repulsion on the identity taskmap, weighted by normalized
    distance-to-limit."""
    params = dict(lower=jnp.asarray(lower_limits, jnp.float32),
                  upper=jnp.asarray(upper_limits, jnp.float32),
                  gamma_p=gamma_p, gamma_d=gamma_d)
    return Policy(name, identity(), _joint_limit_accel_metric, params)
