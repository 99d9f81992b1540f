"""v2 policy set (RMP2/Isaac-style, richer parametrization).

Capability parity with reference rmp2.py:31-226:
  target_attractor   <-> TargetAttractor  (rmp2.py:31-83)
  joint_velocity_cap <-> JointVelocityCap (rmp2.py:86-112)
  joint_damping      <-> JointDamping     (rmp2.py:115-137)
  obstacle_avoidance <-> ObstacleAvoidance(rmp2.py:140-196, 1-D distance space)
  cspace_biasing     <-> CSpaceBiasing    (rmp2.py:198-226)

Formulas replicated exactly, including the JointVelocityCap metric structure
metric = weight / (1 - diag(ratio^2)) — an *elementwise* division of the
scalar by the full matrix, which leaves `weight` on every off-diagonal entry
(rmp2.py:108-109); that is what the reference experiments 05/06 actually run.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rmp_tpu.policies.base import Policy
from rmp_tpu.taskmaps import identity


def _attractor_accel_metric(params, x, xd, ctx):
    del ctx
    goal, eps = params["goal"], params["accel_norm_eps"]
    delta = goal - x                                          # (P, d)
    delta_norm = jnp.linalg.norm(delta, axis=-1, keepdims=True)
    soft = jnp.maximum(delta_norm, eps / 10.0)
    delta_hat = delta / soft

    a = params["accel_p_gain"] * delta / (delta_norm + eps) \
        - params["accel_d_gain"] * xd

    n = x.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=x.dtype), x.shape[:-1] + (n, n))
    S = delta_hat[..., :, None] * delta_hat[..., None, :]
    scaled = delta_norm / params["metric_alpha_length_scale"]
    alpha = (1.0 - params["min_metric_alpha"]) * jnp.exp(-0.5 * scaled * scaled) \
        + params["min_metric_alpha"]                          # (P, 1)
    alpha = alpha[..., None]                                  # (P, 1, 1)
    M = alpha * params["max_metric_scalar"] * eye \
        + (1.0 - alpha) * params["min_metric_scalar"] * S

    boost_scaled = delta_norm / params["proximity_metric_boost_length_scale"]
    boost_a = jnp.exp(-0.5 * boost_scaled * boost_scaled)
    boost = boost_a * params["proximity_metric_boost_scalar"] + (1.0 - boost_a)
    M = boost[..., None] * M
    return a, M


def target_attractor(goal, taskmap, accel_p_gain, accel_d_gain,
                     accel_norm_eps, metric_alpha_length_scale,
                     min_metric_alpha, max_metric_scalar, min_metric_scalar,
                     proximity_metric_boost_scalar,
                     proximity_metric_boost_length_scale,
                     name="attractor") -> Policy:
    params = dict(goal=jnp.asarray(goal, jnp.float32),
                  accel_p_gain=accel_p_gain, accel_d_gain=accel_d_gain,
                  accel_norm_eps=accel_norm_eps,
                  metric_alpha_length_scale=metric_alpha_length_scale,
                  min_metric_alpha=min_metric_alpha,
                  max_metric_scalar=max_metric_scalar,
                  min_metric_scalar=min_metric_scalar,
                  proximity_metric_boost_scalar=proximity_metric_boost_scalar,
                  proximity_metric_boost_length_scale=proximity_metric_boost_length_scale)
    return Policy(name, taskmap, _attractor_accel_metric, params)


def _velocity_cap_accel_metric(params, x, xd, ctx):
    # NOTE (replicated reference quirk, rmp2.py:104-109): the metric
    # w / (1 - ratio^2) is singular at |xd| = max_velocity - region (ratio =
    # -1) and goes strongly negative nearby, making the COMBINED metric
    # indefinite. pinv and the unrolled pivoted-LU resolve handle this;
    # the Cholesky resolve does not — see core.resolve.
    del ctx
    eps = 1e-6
    cutoff = params["max_velocity"] - params["velocity_damping_region"]
    delta_v = jnp.abs(xd) - cutoff                            # (P, n)
    a = -jnp.abs(params["damping_gain"] * delta_v) * jnp.sign(xd)
    clipped = jnp.minimum(delta_v, params["velocity_damping_region"] - eps)
    ratio = clipped / params["velocity_damping_region"]
    # (reference rmp2.py:107 computes a gated ratio but discards it — the
    # ungated ratio feeds the metric; replicated for parity)
    diag = ratio[..., :, None] ** 2 * jnp.broadcast_to(
        jnp.eye(x.shape[-1], dtype=x.dtype), x.shape[:-1] + (x.shape[-1],) * 2)
    M = params["metric_weight"] / (1.0 - diag)
    a = jnp.where(jnp.abs(xd) < cutoff, jnp.zeros_like(a), a)
    return a, M


def joint_velocity_cap(max_velocity, velocity_damping_region, damping_gain,
                       metric_weight, name="joint_velocity_cap") -> Policy:
    params = dict(max_velocity=max_velocity,
                  velocity_damping_region=velocity_damping_region,
                  damping_gain=damping_gain, metric_weight=metric_weight)
    return Policy(name, identity(), _velocity_cap_accel_metric, params)


def _joint_damping_accel_metric(params, x, xd, ctx):
    del ctx
    xd_norm = jnp.linalg.norm(xd, axis=-1, keepdims=True)     # (P, 1)
    a = -(params["accel_d_gain"] * xd_norm) * xd
    scalar = params["metric_scalar"] * xd_norm[..., None]     # (P, 1, 1)
    n = x.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=x.dtype), x.shape[:-1] + (n, n))
    M = eye * (scalar + params["inertia"])
    return a, M


def joint_damping(accel_d_gain, metric_scalar, inertia,
                  name="joint_damping") -> Policy:
    params = dict(accel_d_gain=accel_d_gain, metric_scalar=metric_scalar,
                  inertia=inertia)
    return Policy(name, identity(), _joint_damping_accel_metric, params)


def _obstacle_accel_metric(params, x, xd, ctx):
    # x: (P, 1) distances; 1-D task space per pair
    x = jnp.maximum(x - params["margin"], 0.0)
    r = params["metric_modulation_radius"]
    gate = x * x / (r * r) - 2.0 * x / r + 1.0
    gate = jnp.where(x > r, jnp.zeros_like(gate), gate)
    base = params["metric_scalar"] / (
        x / params["metric_exploder_std_dev"] + params["metric_exploder_eps"])
    metric = base * gate                                      # (P, 1)
    a_repel = params["repulsion_gain"] * jnp.exp(-x / params["repulsion_std_dev"])
    sig = jax.nn.sigmoid(xd / params["damping_velocity_gate_length_scale"])
    divisor = x / params["damping_std_dev"] + params["damping_robustness_eps"]
    a_damp = -(1.0 - sig) * params["damping_gain"] * xd / divisor
    a = a_repel + a_damp
    metric = jnp.where(x > r, jnp.zeros_like(metric), (1.0 - sig) * metric)
    if ctx is not None and "mask" in ctx:
        metric = metric * ctx["mask"].reshape(-1)[:, None]
    M = metric[..., None]                                     # (P, 1, 1)
    return a, M


def obstacle_avoidance(taskmap, margin, damping_gain, damping_std_dev,
                       damping_robustness_eps,
                       damping_velocity_gate_length_scale, repulsion_gain,
                       repulsion_std_dev, metric_modulation_radius,
                       metric_scalar, metric_exploder_std_dev,
                       metric_exploder_eps, name) -> Policy:
    params = dict(margin=margin, damping_gain=damping_gain,
                  damping_std_dev=damping_std_dev,
                  damping_robustness_eps=damping_robustness_eps,
                  damping_velocity_gate_length_scale=damping_velocity_gate_length_scale,
                  repulsion_gain=repulsion_gain,
                  repulsion_std_dev=repulsion_std_dev,
                  metric_modulation_radius=metric_modulation_radius,
                  metric_scalar=metric_scalar,
                  metric_exploder_std_dev=metric_exploder_std_dev,
                  metric_exploder_eps=metric_exploder_eps)
    return Policy(name, taskmap, _obstacle_accel_metric, params)


def _cspace_biasing_accel_metric(params, x, xd, ctx):
    del ctx
    x = x - params["goal"]
    x_norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    x_hat = x / jnp.maximum(x_norm, 1e-12)
    thresh = params["robust_position_term_thresh"]
    a_pos = jnp.where(x_norm < thresh,
                      -x * params["position_gain"],
                      -thresh * x_hat * params["position_gain"])
    a = a_pos - params["damping_gain"] * xd
    n = x.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=x.dtype), x.shape[:-1] + (n, n))
    M = eye * (params["metric_scalar"] + params["inertia"])
    return a, M


def cspace_biasing(goal, metric_scalar, position_gain, damping_gain,
                   robust_position_term_thresh, inertia, taskmap=None,
                   name="cspace_target") -> Policy:
    params = dict(goal=jnp.asarray(goal, jnp.float32),
                  metric_scalar=metric_scalar, position_gain=position_gain,
                  damping_gain=damping_gain,
                  robust_position_term_thresh=robust_position_term_thresh,
                  inertia=inertia)
    return Policy(name, taskmap if taskmap is not None else identity(),
                  _cspace_biasing_accel_metric, params)
